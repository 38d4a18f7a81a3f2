"""Segment-intersection spatial join: which line segments cross?

The reference's spatial predicate vocabulary is point-in-polygon only
(``cut.hpp:42-49``); way geometries are never intersected with anything.
The pair-level question — "which (way-)segments of relation A intersect
segments of relation B?" — is the primitive under road-network
conflation, boundary-crossing detection and self-intersection QA, and at
corpus scale it must not be the O(n²) cross join.

Distributed shape (the bbox-grid filter-and-refine join):

1. each segment is replicated to every grid cell its BOUNDING BOX
   overlaps (map-side ``sequence``×``explode``; the replication factor is
   (span/cell+1)² — pick ``cell`` near the median segment length, so
   typical segments land in 1-4 cells);
2. ONE hash equi-join on the (cx, cy) cell key produces candidates;
3. **exactly-once emission without a distinct**: a candidate pair may
   share many cells, so the pair is emitted only from its *canonical*
   cell — the cell containing the reference point
   ``(max(min_ax, min_bx), max(min_ay, min_by))``, the lower-left corner
   of the two bboxes' intersection. Both bboxes contain that corner, so
   both sides have a replica in exactly that one cell — no post-join
   ``dropDuplicates`` shuffle (same argument as the ε-join's home-cell
   predicate, ``operators/neighbors.py:23-28``);
4. the refine step is the classic integer orientation test (CLRS
   segments-intersect): proper crossings via opposite orientation signs,
   touching/collinear overlap via the zero-orientation + on-bbox check.

Coordinates are non-negative integers end-to-end, so every orientation
sign and the cell keys are bit-exact in Spark, DuckDB, and Python.
Orientation terms are < 2·36000·18000 ≈ 1.3e9 at centidegree scale —
int64 headroom of ~7e9×.

"Intersect" here means **share at least one point** (proper crossing,
T-touch, endpoint touch, or collinear overlap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import grid

__all__ = [
    "segment_intersections",
    "segment_self_intersections",
    "ring_self_intersections",
]


def _orient(px, py, qx, qy, rx, ry) -> Column:
    """Sign-carrying twice-area of (p, q, r): >0 left turn, <0 right."""
    return (qx - px) * (ry - py) - (qy - py) * (rx - px)


def _on_bbox(px, py, qx, qy, rx, ry) -> Column:
    """r within the closed bbox of (p, q) — the collinear on-segment
    check (only applied where the orientation is exactly 0)."""
    return (
        (rx >= F.least(px, qx))
        & (rx <= F.greatest(px, qx))
        & (ry >= F.least(py, qy))
        & (ry <= F.greatest(py, qy))
    )


def _intersects() -> Column:
    """CLRS SEGMENTS-INTERSECT over the joined column names
    (ax1..ay2 / bx1..by2), including touching and collinear overlap."""
    a1x, a1y = F.col("ax1"), F.col("ay1")
    a2x, a2y = F.col("ax2"), F.col("ay2")
    b1x, b1y = F.col("bx1"), F.col("by1")
    b2x, b2y = F.col("bx2"), F.col("by2")
    d1 = _orient(b1x, b1y, b2x, b2y, a1x, a1y)
    d2 = _orient(b1x, b1y, b2x, b2y, a2x, a2y)
    d3 = _orient(a1x, a1y, a2x, a2y, b1x, b1y)
    d4 = _orient(a1x, a1y, a2x, a2y, b2x, b2y)
    proper = (
        ((d1 > 0) & (d2 < 0) | (d1 < 0) & (d2 > 0))
        & ((d3 > 0) & (d4 < 0) | (d3 < 0) & (d4 > 0))
    )
    return (
        proper
        | (d1 == 0) & _on_bbox(b1x, b1y, b2x, b2y, a1x, a1y)
        | (d2 == 0) & _on_bbox(b1x, b1y, b2x, b2y, a2x, a2y)
        | (d3 == 0) & _on_bbox(a1x, a1y, a2x, a2y, b1x, b1y)
        | (d4 == 0) & _on_bbox(a1x, a1y, a2x, a2y, b2x, b2y)
    )


def _replicate(segs: DataFrame, side: str, cell: int) -> DataFrame:
    """Project a segment relation onto its covered grid cells.

    Emits one row per (segment, overlapped cell) with columns prefixed
    by ``side`` plus the integer cell coordinates (cx, cy). ``sequence``
    is map-side — no shuffle, fan-out = cells covered by the bbox.
    """
    p = side
    sel = segs.select(
        F.col("id").alias(f"id_{p}"),
        F.col("x1").cast("long").alias(f"{p}x1"),
        F.col("y1").cast("long").alias(f"{p}y1"),
        F.col("x2").cast("long").alias(f"{p}x2"),
        F.col("y2").cast("long").alias(f"{p}y2"),
    )
    lox = F.least(f"{p}x1", f"{p}x2")
    hix = F.greatest(f"{p}x1", f"{p}x2")
    loy = F.least(f"{p}y1", f"{p}y2")
    hiy = F.greatest(f"{p}y1", f"{p}y2")
    c = F.lit(cell)

    def fdiv(col: Column) -> Column:
        return grid.fdiv(col, c)

    return (
        sel.withColumn("cx", F.explode(F.sequence(fdiv(lox), fdiv(hix))))
        .withColumn("cy", F.explode(F.sequence(fdiv(loy), fdiv(hiy))))
    )


def segment_intersections(
    a: DataFrame, b: DataFrame, cell: int
) -> DataFrame:
    """All (a, b) pairs whose segments share at least one point.

    Both inputs: ``(id, x1, y1, x2, y2)`` with NON-NEGATIVE integer
    coordinates (the ``xs``/``ys`` convention of the ε-join layer).
    ``cell`` is the grid edge — choose it near the median segment
    length. Returns ``(id_a, id_b)``.
    """
    if cell < 1:
        raise ValueError(f"cell must be a positive integer, got {cell}")
    lhs = _replicate(a, "a", cell)
    rhs = _replicate(b, "b", cell)
    c = F.lit(cell)
    # canonical cell: lower-left corner of the bbox intersection
    rpx = F.greatest(
        F.least("ax1", "ax2"), F.least("bx1", "bx2")
    )
    rpy = F.greatest(
        F.least("ay1", "ay2"), F.least("by1", "by2")
    )
    canonical = (((rpx - rpx % c) / c).cast("long") == F.col("cx")) & (
        ((rpy - rpy % c) / c).cast("long") == F.col("cy")
    )
    return (
        lhs.join(rhs, ["cx", "cy"])
        .filter(canonical)
        .filter(_intersects())
        .select("id_a", "id_b")
    )


def ring_self_intersections(segs: DataFrame, cell: int) -> DataFrame:
    """Non-adjacent self-intersections WITHIN each ring — the OGC
    "is this shell simple?" validity test, run corpus-wide.

    ``segs(gid, seq, nseg, x1, y1, x2, y2)``: ring ``gid``'s directed
    edges in order ``seq = 0..nseg-1`` (closing edge included),
    non-negative integer coordinates. Returns ``(gid, seq_a, seq_b)``
    with ``seq_a < seq_b`` for every pair of NON-ADJACENT edges of the
    same ring that share at least one point; a ring is simple iff it has
    no rows here. Adjacent pairs (``Δseq = 1`` and the ``(0, nseg-1)``
    wrap) legitimately share a vertex and are excluded — repeated
    non-consecutive vertices and zero-length edges still count, which is
    exactly the OGC rule. The reference never validates its ``.poly``
    rings (``geometryreader.hpp`` trusts the file); this is the QA pass
    you'd run before trusting third-party clipbounds at corpus scale.

    Shape: same bbox-grid replicate → ONE hash equi-join as
    :func:`segment_intersections`, but ``gid`` IS part of the join key —
    two rings sharing a cell never meet, so candidate volume is per-ring
    local — and the canonical-cell rule again gives exactly-once pairs
    with no distinct."""
    if cell < 1:
        raise ValueError(f"cell must be a positive integer, got {cell}")

    def rep(p: str) -> DataFrame:
        sel = segs.select(
            F.col("gid").cast("long").alias("gid"),
            F.col("seq").cast("long").alias(f"seq_{p}"),
            F.col("nseg").cast("long").alias(f"nseg_{p}"),
            F.col("x1").cast("long").alias(f"{p}x1"),
            F.col("y1").cast("long").alias(f"{p}y1"),
            F.col("x2").cast("long").alias(f"{p}x2"),
            F.col("y2").cast("long").alias(f"{p}y2"),
        )
        lox = F.least(f"{p}x1", f"{p}x2")
        hix = F.greatest(f"{p}x1", f"{p}x2")
        loy = F.least(f"{p}y1", f"{p}y2")
        hiy = F.greatest(f"{p}y1", f"{p}y2")
        c = F.lit(cell)

        def fdiv(col: Column) -> Column:
            return ((col - col % c) / c).cast("long")

        return sel.withColumn(
            "cx", F.explode(F.sequence(fdiv(lox), fdiv(hix)))
        ).withColumn("cy", F.explode(F.sequence(fdiv(loy), fdiv(hiy))))

    lhs = rep("a")
    rhs = rep("b").drop("nseg_b")
    c = F.lit(cell)
    rpx = F.greatest(F.least("ax1", "ax2"), F.least("bx1", "bx2"))
    rpy = F.greatest(F.least("ay1", "ay2"), F.least("by1", "by2"))
    canonical = (((rpx - rpx % c) / c).cast("long") == F.col("cx")) & (
        ((rpy - rpy % c) / c).cast("long") == F.col("cy")
    )
    non_adjacent = (F.col("seq_b") - F.col("seq_a") > 1) & ~(
        (F.col("seq_a") == 0) & (F.col("seq_b") == F.col("nseg_a") - 1)
    )
    return (
        lhs.join(rhs, ["gid", "cx", "cy"])
        .filter(F.col("seq_a") < F.col("seq_b"))
        .filter(non_adjacent)
        .filter(canonical)
        .filter(_intersects())
        .select("gid", "seq_a", "seq_b")
    )


def segment_self_intersections(segs: DataFrame, cell: int) -> DataFrame:
    """Unordered intersecting pairs within ONE segment relation —
    ``(id_a, id_b)`` with ``id_a < id_b`` (the ``<`` predicate plus the
    canonical-cell rule give exactly-once emission, as in
    :func:`within_distance_pairs`)."""
    return segment_intersections(segs, segs, cell).filter(
        F.col("id_a") < F.col("id_b")
    )
