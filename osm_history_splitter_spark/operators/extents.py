"""Rectangle-extent overlap join: which bounding boxes intersect?

The reference touches extents in exactly one place — each extract's bbox
envelope gates the point test (``cut.hpp:42-49``, ``growbbox`` in
``geometryreader.hpp``) — and only ever point-vs-one-bbox. The pair-level
question "which extents of set A overlap extents of set B" is the
filter half of every vector overlay (way-bbox × way-bbox before the
segment refine), the page-region conflation step for geotagged web
corpora, and the classic R-tree join — which at corpus scale must not be
the O(n²) nested loop a single-node tree walk degenerates to.

Distributed shape (same bbox-grid discipline as ``segjoin.py``):

1. each rectangle is replicated map-side to every grid cell it overlaps
   (``sequence`` × ``explode``; fan-out = (span/cell+1)² — pick ``cell``
   near the median rectangle edge, so typical rects land in 1-4 cells);
2. ONE hash equi-join on the (cx, cy) cell key yields candidate pairs;
3. **exactly-once without a distinct**: a pair may share many cells, so
   it is emitted only from its *canonical* cell — the cell containing
   the lower-left corner of the two rectangles' intersection
   ``(max(ax0, bx0), max(ay0, by0))``. When the closed intersection is
   non-empty both rectangles contain that corner, so both sides have a
   replica in exactly that one cell (the ``segment_intersections``
   argument, ``operators/segjoin.py:56-78``);
4. the refine step is the closed-interval overlap test itself — two
   comparisons per axis, pure codegen.

"Overlap" is the CLOSED predicate: rectangles sharing only an edge or a
corner DO overlap (intersection area 0, reported as such) — matching the
reference's closed ``growbbox`` envelopes, and the caller can filter
``inter_area > 0`` for the open semantics. Coordinates are non-negative
integers end-to-end; every key and area is bit-exact in Spark, DuckDB
and Python (areas < 36000²·18000² is irrelevant — inputs are extents, so
area < 36000·18000 ≈ 6.5e8, int64-safe by ~1.4e10×).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import grid

__all__ = ["rect_overlap_join"]

_COLS = ("id", "x0", "y0", "x1", "y1")


def _replicate(rects: DataFrame, side: str, cell: int) -> DataFrame:
    """One row per (rectangle, overlapped grid cell), columns prefixed
    by ``side``. ``sequence`` is map-side — no shuffle."""
    p = side
    sel = rects.select(
        F.col("id").alias(f"id_{p}"),
        *[F.col(c).cast("long").alias(f"{p}{c}") for c in _COLS[1:]],
    )
    c = F.lit(cell)

    def fd(col) -> Column:
        return grid.fdiv(F.col(col), c)

    return sel.withColumn(
        "cx", F.explode(F.sequence(fd(f"{p}x0"), fd(f"{p}x1")))
    ).withColumn("cy", F.explode(F.sequence(fd(f"{p}y0"), fd(f"{p}y1"))))


def rect_overlap_join(a: DataFrame, b: DataFrame, cell: int) -> DataFrame:
    """All (a, b) rectangle pairs whose closed extents intersect.

    Both inputs: ``(id, x0, y0, x1, y1)`` with NON-NEGATIVE integer
    coordinates and ``x0 <= x1``, ``y0 <= y1`` (caller normalizes —
    ``least``/``greatest`` upstream if needed). Returns one row per
    overlapping pair: ``(id_a, id_b, ix0, iy0, ix1, iy1, inter_area)``
    — the intersection extent and its area (0 for edge/corner touches).

    Plan: two map-side cell fan-outs → one hash equi-join on (cx, cy) →
    canonical-cell + overlap filter, all codegen. No CartesianProduct,
    no post-join distinct (plan-asserted in tests/test_extents.py).
    """
    if cell < 1:
        raise ValueError(f"cell must be a positive integer, got {cell}")
    lhs = _replicate(a, "a", cell)
    rhs = _replicate(b, "b", cell)
    c = F.lit(cell)
    ix0 = F.greatest("ax0", "bx0")
    iy0 = F.greatest("ay0", "by0")
    ix1 = F.least("ax1", "bx1")
    iy1 = F.least("ay1", "by1")
    overlap = (ix0 <= ix1) & (iy0 <= iy1)
    canonical = (grid.fdiv(ix0, c) == F.col("cx")) & (
        grid.fdiv(iy0, c) == F.col("cy")
    )
    return (
        lhs.join(rhs, ["cx", "cy"])
        .filter(overlap & canonical)
        .select(
            "id_a",
            "id_b",
            ix0.alias("ix0"),
            iy0.alias("iy0"),
            ix1.alias("ix1"),
            iy1.alias("iy1"),
            ((ix1 - ix0) * (iy1 - iy0)).cast("long").alias("inter_area"),
        )
    )
