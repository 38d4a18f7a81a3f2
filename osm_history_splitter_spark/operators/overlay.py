"""Vector overlay: convex-polygon intersection join with EXACT rational
areas — the refine step the extent prefilter (`operators/extents.py`)
feeds, and the missing half of the raster-side overlay family
(`zonal_stats` aggregates BY polygon; this computes polygon∩polygon).

Reference analog: the reference delegates all polygon geometry to GEOS
(``geometryreader.hpp``) and never overlays; a tiling/splitting engine
needs overlay for extract×extract accounting (how much of extract A's
area is also in B), clip-to-tile area weighting, and coverage QA.

Semantics: inputs are CONVEX rings in integer coordinates (the repo's
exactness convention — quantize upstream like every grid op). A pair is
emitted iff the open interiors intersect (positive area); edge/corner
touches are NOT pairs — the strict/interior-only rule (`cut.hpp:36-40`)
carried to overlays. The intersection of two convex polygons is convex;
its vertices are original vertices and edge×edge crossing points, which
are RATIONAL. All arithmetic is ``fractions.Fraction`` — no float ever
enters a decision — and the area is returned as a reduced fraction
``area2_num / area2_den`` of DOUBLED area (shoelace form) in STRING
columns — crossing-point denominators compound through the shoelace
sum, so the exact value must not be truncated to int64; a float64
``area`` convenience column rides along for ranking/aggregation.

Scale shape: stage 1 is the grid-bucketed extent join (codegen, no
CartesianProduct); stage 2 ships only SURVIVING candidate pairs' vertex
arrays through ONE Arrow ``mapInPandas`` — the kernel is O(|A|·|B|) per
pair (Sutherland–Hodgman over convex inputs), driver never sees
geometry. Hot cells follow the extents-join salting guidance; the pair
stream is embarrassingly parallel.

No SQL twin: sequential per-pair geometry (the Douglas-Peucker /
ring-stitching category) — certified instead by an INDEPENDENT exact
algorithm (hull-of-candidate-points construction) and analytic
fixtures in ``tests/test_overlay.py``.
"""

from __future__ import annotations

from fractions import Fraction
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .extents import rect_overlap_join

__all__ = [
    "clip_convex",
    "polygon_area2",
    "convex_overlay_join",
]


def polygon_area2(ring: list[tuple]) -> Fraction:
    """Doubled signed shoelace area of ``ring`` (CCW positive), exact."""
    s = Fraction(0)
    n = len(ring)
    for i in range(n):
        x0, y0 = ring[i]
        x1, y1 = ring[(i + 1) % n]
        s += Fraction(x0) * Fraction(y1) - Fraction(x1) * Fraction(y0)
    return s


def _ccw(ring: list[tuple]) -> list[tuple]:
    return ring if polygon_area2(ring) >= 0 else ring[::-1]


def clip_convex(subject: list[tuple], clip: list[tuple]) -> list[tuple]:
    """Sutherland–Hodgman: clip convex ``subject`` by convex ``clip``
    (both auto-oriented CCW), exact rational vertices. Returns the
    intersection ring (possibly degenerate: <3 vertices or zero area)."""
    out = [(Fraction(x), Fraction(y)) for x, y in _ccw(subject)]
    clip = _ccw(clip)
    n = len(clip)
    for i in range(n):
        if not out:
            return []
        ax, ay = clip[i]
        bx, by = clip[(i + 1) % n]
        ex, ey = Fraction(bx) - Fraction(ax), Fraction(by) - Fraction(ay)

        def side(p):
            return ex * (p[1] - ay) - ey * (p[0] - ax)

        nxt: list[tuple] = []
        m = len(out)
        for j in range(m):
            cur, prv = out[j], out[j - 1]
            sc, sp = side(cur), side(prv)
            if sc >= 0:
                if sp < 0:
                    t = sp / (sp - sc)
                    nxt.append(
                        (prv[0] + t * (cur[0] - prv[0]),
                         prv[1] + t * (cur[1] - prv[1]))
                    )
                nxt.append(cur)
            elif sp >= 0:
                t = sp / (sp - sc)
                nxt.append(
                    (prv[0] + t * (cur[0] - prv[0]),
                     prv[1] + t * (cur[1] - prv[1]))
                )
        out = nxt
    return out


def _extents(df: DataFrame) -> DataFrame:
    return df.select(
        F.col("gid").alias("id"),
        F.expr("array_min(xs)").cast("long").alias("x0"),
        F.expr("array_min(ys)").cast("long").alias("y0"),
        F.expr("array_max(xs)").cast("long").alias("x1"),
        F.expr("array_max(ys)").cast("long").alias("y1"),
    )


def convex_overlay_join(
    a: DataFrame, b: DataFrame, cell: int
) -> DataFrame:
    """Exact intersection-area join between two convex-polygon layers.

    Inputs: ``(gid, xs array<long>, ys array<long>)`` — convex rings,
    NON-NEGATIVE integer coords (the extent prefilter's contract),
    any orientation, no closing repeat vertex. Returns one row per pair
    with intersecting INTERIORS: ``(gid_a, gid_b, area2_num,
    area2_den, area, n_vertices)`` where the exact area is
    area2_num / (2·area2_den) (strings; unbounded precision) and
    ``area`` is its float64 rendering.

    ``cell`` is the extent-join bucket size (≈ median polygon extent).
    """
    pairs = rect_overlap_join(_extents(a), _extents(b), cell)
    av = a.select(
        F.col("gid").alias("id_a"),
        F.col("xs").alias("axs"),
        F.col("ys").alias("ays"),
    )
    bv = b.select(
        F.col("gid").alias("id_b"),
        F.col("xs").alias("bxs"),
        F.col("ys").alias("bys"),
    )
    cand = (
        pairs.select("id_a", "id_b")
        .join(av, "id_a")
        .join(bv, "id_b")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                subj = list(zip([int(v) for v in r.axs],
                                [int(v) for v in r.ays]))
                clip = list(zip([int(v) for v in r.bxs],
                                [int(v) for v in r.bys]))
                ring = clip_convex(subj, clip)
                if len(ring) < 3:
                    continue
                a2 = abs(polygon_area2(ring))
                if a2 == 0:
                    continue
                rows.append(
                    (
                        int(r.id_a),
                        int(r.id_b),
                        str(a2.numerator),
                        str(a2.denominator),
                        float(a2) / 2.0,
                        len(ring),
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "gid_a", "gid_b", "area2_num", "area2_den",
                        "area", "n_vertices",
                    ],
                )

    return cand.mapInPandas(
        kernel,
        schema=(
            "gid_a long, gid_b long, area2_num string, area2_den string,"
            " area double, n_vertices int"
        ),
    )
