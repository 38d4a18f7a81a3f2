"""Distributed convex hull: map-side partial hulls, exact driver merge.

The reference has no aggregate geometry at all — its only per-extract
"shape" is the configured bbox/polygon (``cut.hpp:71-118``). The hull of
a point corpus (extract footprint estimation, coverage QA, bounding
geometry for broadcast pruning) is the classic example of an aggregate
with a tiny, data-independent result but a data-scale input — exactly
the shape Spark's two-level aggregation handles, just not expressible
with built-in SQL aggregates.

Plan shape — ZERO shuffles:

1. ``mapInPandas`` folds each partition into its PARTIAL hull: batches
   stream through Andrew's monotone chain, carrying only the running
   hull candidates between batches, so peak memory per task is
   O(|partial hull| + |batch|), never O(|partition|);
2. the partial hulls are collected — bounded by Σ per-partition hull
   sizes. For P partitions of random points the expectation is
   O(P·log n); the adversarial worst case (every point on one circle)
   makes the hull = the input, and no algorithm shrinks that — callers
   hulling known-degenerate data should pre-aggregate;
3. the driver runs one exact monotone chain over the candidates with
   arbitrary-precision Python ints (no overflow at ANY coordinate
   magnitude) and emits the final ring.

Determinism: the result is a function of the point SET — partitioning
cannot change it (hull(∪ partial hulls) = hull(all points)), collinear
edge-interior points are always excluded (strict-turn pops), and when
several ids share a hull coordinate the MINIMUM id wins (min is
associative, so partition order never shows through).

Returns the hull ring CCW, starting at the lexicographically smallest
``(xs, ys)`` vertex: ``(pos, id, xs, ys)``.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

__all__ = ["convex_hull", "monotone_chain"]


def _cross(o, a, b) -> int:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def monotone_chain(points: Iterable[tuple]) -> list:
    """Andrew's monotone chain over ``(x, y, id)`` tuples — exact int
    arithmetic, strict turns (collinear edge-interior points dropped),
    duplicate coordinates collapsed to the smallest id. Returns the CCW
    hull ring starting at the smallest ``(x, y)``; degenerate inputs
    yield 1 (single point) or 2 (all collinear) vertices."""
    best: dict = {}
    for x, y, i in points:
        key = (x, y)
        if key not in best or i < best[key]:
            best[key] = i
    pts = sorted((x, y, i) for (x, y), i in best.items())
    if len(pts) <= 2:
        return pts
    lower: list = []
    for p in pts:
        while len(lower) >= 2 and _cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(pts):
        while len(upper) >= 2 and _cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    ring = lower[:-1] + upper[:-1]
    return ring if len(ring) >= 3 else [pts[0], pts[-1]]


def convex_hull(pts: DataFrame, id_col: str = "id") -> DataFrame:
    """Convex hull of ``(id, xs, ys)`` integer points (CCW ring with
    ``pos`` order; see module docstring for the distributed shape)."""
    spark = pts.sparkSession
    src = pts.selectExpr(
        f"cast({id_col} as long) as id",
        "cast(xs as long) as xs",
        "cast(ys as long) as ys",
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hull: list = []
        for b in batches:
            pts_b = list(
                zip(
                    (int(v) for v in b["xs"]),
                    (int(v) for v in b["ys"]),
                    (int(v) for v in b["id"]),
                )
            )
            hull = monotone_chain(hull + pts_b)
        if hull:
            yield pd.DataFrame(
                {
                    "xs": [p[0] for p in hull],
                    "ys": [p[1] for p in hull],
                    "id": [p[2] for p in hull],
                }
            )

    # bounded collect: partial hulls only — Σ per-partition hull sizes,
    # O(P·log n) expected (see module docstring for the degenerate case)
    cand = src.mapInPandas(partial, "xs long, ys long, id long").collect()
    ring = monotone_chain((r["xs"], r["ys"], r["id"]) for r in cand)
    rows = [
        (pos, i, x, y) for pos, (x, y, i) in enumerate(ring)
    ]
    return spark.createDataFrame(
        rows, "pos int, id long, xs long, ys long"
    )
