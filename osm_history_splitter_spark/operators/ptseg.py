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

from ..functions import grid
from pyspark.sql.window import Window as WindowSpec

__all__ = ["points_near_segments", "snap_to_segments"]

#: the non-negative integer coordinate domain (centidegree convention)
_MAX_X = 36000 - 1
_MAX_Y = 18000 - 1


def _fdiv(col: Column, c: Column) -> Column:
    """Floor division for NON-NEGATIVE integer columns (callers clamp)."""
    return grid.fdiv(col, c)


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


def _dist_frac() -> tuple[Column, Column]:
    """The squared point-segment distance as an exact RATIONAL
    ``num/den`` over the joined column names: the endpoint cases are
    integers (``den = 1``), the interior case is ``cross²/|AB|²`` —
    representing it as a fraction (instead of dividing) keeps every
    later comparison a cross-multiplication. ``num ≤ 1.7e18`` (long),
    ``den ≤ 1.7e9``; exact cross-compares of two fractions need
    ``num·den ≤ 2.9e27`` — done in decimal(38,0), see
    :func:`snap_to_segments`."""
    px, py = F.col("px"), F.col("py")
    ax, ay = F.col("x1"), F.col("y1")
    bx, by = F.col("x2"), F.col("y2")
    abx, aby = bx - ax, by - ay
    apx, apy = px - ax, py - ay
    bpx, bpy = px - bx, py - by
    dot = apx * abx + apy * aby
    l2 = abx * abx + aby * aby
    cross = abx * apy - aby * apx
    num = (
        F.when(dot <= 0, apx * apx + apy * apy)
        .when(dot >= l2, bpx * bpx + bpy * bpy)
        .otherwise(cross * cross)
    )
    den = (
        F.when(dot <= 0, F.lit(1).cast("long"))
        .when(dot >= l2, F.lit(1).cast("long"))
        .otherwise(l2)
    )
    return num.cast("long"), den.cast("long")


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

    The ``points`` side may be a STREAMING frame: it is a stateless
    projection into a stream-static inner equi-join (zero state store),
    so a drained backlog equals the batch join
    (tests/test_ptseg.py::test_stream_static_matches_batch).
    """
    if eps < 0:
        raise ValueError(f"eps must be non-negative, got {eps}")
    return (
        _candidates(points, segs, eps, cell)
        .filter(_within(eps))
        .select("id_p", "id_s")
    )


def _candidates(
    points: DataFrame, segs: DataFrame, eps: int, cell: int
) -> DataFrame:
    """Exactly-once candidate pairs: every (point, segment) whose
    ε-expanded segment bbox contains the point's home cell — a superset
    of all pairs at distance ≤ ε (each axis offset of a within-ε pair is
    ≤ ε). One row per pair, columns (id_p, px, py, id_s, x1..y2)."""
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
    return pts.join(rhs, ["cx", "cy"]).drop("cx", "cy")


#: decimal type wide enough for num·den cross-products (≤ 2.9e27)
_DEC = "decimal(38,0)"


def _strictly_better(a: str, b: str) -> Column:
    """Exact 'candidate ``b`` beats candidate ``a``' over prefixed
    fraction columns: smaller distance, or equal distance and smaller
    segment id. ``numᵇ/denᵇ < numᵃ/denᵃ ⇔ numᵇ·denᵃ < numᵃ·denᵇ``
    (denominators positive) — cross-products up to ~2.9e27 overflow
    int64, so the compare runs in decimal(38,0); the fraction columns
    themselves stay long."""
    lhs = F.col(f"{b}num").cast(_DEC) * F.col(f"{a}den").cast(_DEC)
    rhs = F.col(f"{a}num").cast(_DEC) * F.col(f"{b}den").cast(_DEC)
    return (lhs < rhs) | (
        (lhs == rhs) & (F.col(f"{b}id_s") < F.col(f"{a}id_s"))
    )


def snap_to_segments(
    points: DataFrame,
    segs: DataFrame,
    init_radius: int,
    max_radius: int = 46_000,
    cell: int | None = None,
) -> DataFrame:
    """Snap every point to its NEAREST segment (the map-matching /
    address-snapping step after :func:`points_near_segments`'s buffer
    query) — without a cross join, via the same iterative radius
    doubling as ``neighbors.knn_join``.

    Round i generates candidates at radius ``init_radius·2ⁱ`` for the
    points still unresolved; a point RESOLVES when its best candidate
    lies within the round's radius (every non-candidate segment is
    farther than the radius, so the best candidate is the global
    nearest). At ``max_radius`` (domain diameter) everything reachable
    is a candidate, so any remaining point takes its best or — with an
    empty segment relation — stays absent from the output.

    The argmin itself is EXACT: squared distance is the rational
    ``num/den`` of :func:`_dist_frac`, and "candidate b beats a" is the
    decimal(38,0) cross-multiplication of :func:`_strictly_better` —
    the winner is the candidate no other candidate beats (a per-point
    left-anti self-join, O(k²) per point). Because k can be large in a
    dense round, a CONSERVATIVE float pre-prune runs first: a per-point
    window min of ``num/den`` in double, keeping everything within a
    1e-9 relative margin of it. Each double rounding (long→double for
    num and den, then the division) is within 2⁻⁵³ relative, so the
    computed ratio is within < 2⁻⁵¹ ≈ 4.4e-16 of the true rational —
    six orders of magnitude inside the margin. Any candidate outside
    the margin is therefore exactly worse than the min: the prune can
    only drop provably-losing candidates, never the exact winner or an
    exact tie.
    The quadratic step then sees k ≈ 1. Float never decides the winner;
    ties still break identically on every engine: by segment id
    ascending.

    Returns ``(id_p, id_s, d2_num, d2_den)`` — one row per point, the
    squared snap distance as an exact fraction.
    """
    if init_radius < 1:
        raise ValueError(f"init_radius must be >= 1, got {init_radius}")
    out: DataFrame | None = None
    lhs = points.select("id", "x", "y")
    r = init_radius
    while True:
        r = min(r, max_radius)
        num, den = _dist_frac()
        cand = _candidates(lhs, segs, r, cell or r).select(
            "id_p", "id_s", num.alias("num"), den.alias("den")
        )
        # conservative float pre-prune (see docstring): shrink k before
        # the exact-quadratic step; cannot drop the winner or a tie
        d2f = F.col("num").cast("double") / F.col("den").cast("double")
        minf = F.min(d2f).over(WindowSpec.partitionBy("id_p"))
        cand = cand.withColumn("_d2f", d2f).withColumn("_minf", minf).filter(
            F.col("_d2f") <= F.col("_minf") * (1.0 + 1e-9)
        ).drop("_d2f", "_minf")
        rival = cand.select(
            F.col("id_p").alias("r_id_p"), F.col("id_s").alias("r_id_s"),
            F.col("num").alias("r_num"), F.col("den").alias("r_den"),
        )
        best = cand.alias("c").join(
            rival,
            (F.col("id_p") == F.col("r_id_p")) & _strictly_better("", "r_"),
            "left_anti",
        )
        if r >= max_radius:
            resolved = best
        else:
            # winner counts only if inside the disc: num ≤ r²·den
            # (r²·den ≤ 2.1e9 · 1.7e9 ≈ 3.6e18 — still int64)
            resolved = best.filter(
                F.col("num") <= F.lit(r * r) * F.col("den")
            )
        # checkpoint the round's winners (≤ one row per point): the
        # residue derives from it AND the final union reads it back —
        # without this, every round's candidate join executes twice
        # (once for the residue, once at the caller's action)
        resolved = resolved.select(
            "id_p", "id_s",
            F.col("num").alias("d2_num"), F.col("den").alias("d2_den"),
        ).localCheckpoint(eager=True)
        out = resolved if out is None else out.unionByName(resolved)
        if r >= max_radius:
            break
        lhs = lhs.join(
            resolved.select(F.col("id_p").alias("id")), "id", "left_anti"
        ).localCheckpoint(eager=True)
        if lhs.limit(1).count() == 0:  # bounded probe, metadata-scale
            break
        r *= 2
    return out
