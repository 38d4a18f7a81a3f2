"""Point-to-segment distance join: which points lie within ε of a
(way-)segment?

The reference's spatial vocabulary stops at point-in-polygon membership
(``cut.hpp:42-49``); the pair type it never asks about is point ×
*polyline* — "which POIs are on/near this road", the primitive under
map-matching, address snapping and buffer queries. The engine's other
pair joins cover point×point (``neighbors.py``) and segment×segment
(``segjoin.py``); this module fills the remaining corner, with the same
filter-and-refine discipline:

1. each segment is replicated to every grid cell its ε-EXPANDED
   bounding box overlaps (map-side ``sequence``×``explode``) — cells are
   clamped to the non-negative coordinate domain, so a near-border
   expansion never emits cells no point can live in;
2. each point lands in exactly ONE cell (its home cell), so a single
   hash equi-join on (cx, cy) produces every candidate pair **exactly
   once** — no canonical-cell predicate, no ``dropDuplicates``;
3. the refine step is the classic three-case point-segment distance,
   done entirely in integer cross-multiplications:

   - ``dot = AP·AB ≤ 0``       → endpoint A governs: ``|AP|² ≤ ε²``
   - ``dot ≥ |AB|²``           → endpoint B governs: ``|BP|² ≤ ε²``
   - otherwise (interior)      → ``cross(AB, AP)² ≤ ε²·|AB|²``
     (the perpendicular distance ``|cross|/|AB|`` never materializes
     as a float — both sides of the comparison stay integers)

   A zero-length segment degenerates to the first case.

Coordinates are non-negative integers on the ``xs``/``ys`` convention
(< 36000 × 18000 at centidegree scale), so every term is bit-exact in
Spark, DuckDB and Python: ``cross ≤ 2·36000·18000 ≈ 1.3e9`` and
``cross² ≤ 1.7e18`` — inside int64 (9.2e18) with ~5× headroom, and
``ε²·|AB|²`` stays below that for any ε up to the domain diagonal.

At scale this is one map-side fan-out (replication = cells covered by
the expanded bbox — pick ``cell`` near the median segment length + ε),
one shuffle (the cell equi-join), and a codegen-only refine: no
CartesianProduct at any input size, skew bounded by the densest cell.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["points_near_segments"]

#: the non-negative integer coordinate domain (centidegree convention)
_MAX_X = 36000 - 1
_MAX_Y = 18000 - 1


def _fdiv(col: Column, c: Column) -> Column:
    """Floor division for NON-NEGATIVE integer columns (callers clamp)."""
    return ((col - col % c) / c).cast("long")


def _within(eps: int) -> Column:
    """The integer three-case point-segment predicate over the joined
    column names (px, py / x1..y2)."""
    px, py = F.col("px"), F.col("py")
    ax, ay = F.col("x1"), F.col("y1")
    bx, by = F.col("x2"), F.col("y2")
    abx, aby = bx - ax, by - ay
    apx, apy = px - ax, py - ay
    bpx, bpy = px - bx, py - by
    dot = apx * abx + apy * aby
    l2 = abx * abx + aby * aby
    cross = abx * apy - aby * apx
    e2 = F.lit(eps * eps)
    near_a = apx * apx + apy * apy <= e2
    near_b = bpx * bpx + bpy * bpy <= e2
    return (
        F.when(dot <= 0, near_a)
        .when(dot >= l2, near_b)
        .otherwise(cross * cross <= e2 * l2)
    )


def points_near_segments(
    points: DataFrame, segs: DataFrame, eps: int, cell: int
) -> DataFrame:
    """All (point, segment) pairs at distance ≤ ``eps``.

    ``points``: ``(id, x, y)``; ``segs``: ``(id, x1, y1, x2, y2)`` —
    both with NON-NEGATIVE integer coordinates (the ``xs``/``ys``
    convention of the ε-join layer). ``eps`` is inclusive (a point
    exactly ε away is IN — the ≤ makes the predicate's complement
    strict, mirroring the strict-interior membership rule). Returns
    ``(id_p, id_s)``, exactly once per qualifying pair.
    """
    if eps < 0:
        raise ValueError(f"eps must be non-negative, got {eps}")
    if cell < 1:
        raise ValueError(f"cell must be a positive integer, got {cell}")
    c = F.lit(cell)
    e = F.lit(eps)

    pts = points.select(
        F.col("id").alias("id_p"),
        F.col("x").cast("long").alias("px"),
        F.col("y").cast("long").alias("py"),
    ).withColumn("cx", _fdiv(F.col("px"), c)).withColumn(
        "cy", _fdiv(F.col("py"), c)
    )

    s = segs.select(
        F.col("id").alias("id_s"),
        F.col("x1").cast("long").alias("x1"),
        F.col("y1").cast("long").alias("y1"),
        F.col("x2").cast("long").alias("x2"),
        F.col("y2").cast("long").alias("y2"),
    )
    lox = F.greatest(F.lit(0), F.least("x1", "x2") - e)
    hix = F.least(F.lit(_MAX_X), F.greatest("x1", "x2") + e)
    loy = F.greatest(F.lit(0), F.least("y1", "y2") - e)
    hiy = F.least(F.lit(_MAX_Y), F.greatest("y1", "y2") + e)
    rhs = (
        s.withColumn("cx", F.explode(F.sequence(_fdiv(lox, c), _fdiv(hix, c))))
        .withColumn("cy", F.explode(F.sequence(_fdiv(loy, c), _fdiv(hiy, c))))
    )

    return (
        pts.join(rhs, ["cx", "cy"])
        .filter(_within(eps))
        .select("id_p", "id_s")
    )
