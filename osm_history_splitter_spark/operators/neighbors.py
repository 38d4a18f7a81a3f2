"""Distance-bounded spatial self-join (ε-neighbor pairs) and grid-DBSCAN.

The reference engine answers one spatial question — "which extract(s)
contain this point?" (``cut.hpp``'s per-extract ``IndexedPointInAreaLocator``
probe). A distributed tiling engine needs the symmetric question too:
"which PAIRS of points are within ε of each other?" — the primitive under
near-duplicate geotag detection, POI conflation, and density clustering.
A naive answer is the n² cross join; at 10¹² rows that is not a plan, it
is an outage.

The classic distributed ε-join (the GeoSpark / Apache Sedona shape,
re-derived here for a plain DataFrame engine) buckets points into a grid
whose cell edge equals ε, so every qualifying pair lives in the SAME or an
ADJACENT cell, and the cross join collapses to a cell equi-join:

- the LEFT side keeps each point once, keyed by its home cell;
- the RIGHT side replicates each point into its 3×3 cell neighborhood
  (constant ×9 map-side explode — no shuffle amplification beyond it);
- the join is a plain hash equi-join on the cell key, so Catalyst
  hash-partitions both sides and AQE's skew-join split handles hot cells
  (city-center skew) without a custom salter.

**Exactly-once pair emission without a distinct**: for a qualifying pair
(a, b) with ``a.id < b.id``, the join matches twice — (left=a, right=b's
replica in a's home cell) and (left=b, right=a's replica in b's home
cell) — and the ``left.id < right.id`` predicate keeps exactly the first.
No post-join ``dropDuplicates`` (which would be a second shuffle over the
pair set, the largest relation in the query).

Coordinates are integer (centidegrees) end-to-end, so the squared
distance and the cell key are bit-exact in Spark, DuckDB, and numpy —
the oracle hash gate never sees a float.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import grid

__all__ = [
    "within_distance_pairs",
    "within_distance_join",
    "knn_join",
    "grid_dbscan_cells",
    "geodesic_pairs",
    "geodesic_join",
    "geodesic_knn_join",
    "variogram_bins",
]

#: cell-key packing stride: cells are (xs // r, ys // r) with
#: xs ∈ [0, 36000), so xs // r < 2**16 for any r ≥ 1 — 2**32 packing can
#: never collide x into y
_PACK = 2**32


def _cell(xs: Column, ys: Column, r: int) -> Column:
    """Pack the ε-grid cell of a NON-NEGATIVE integer point into int64.

    Floor division on non-negative ints is identical in Spark, DuckDB
    (`//`), and Python (`//`) — negative coordinates are shifted out
    before this is called, so truncation-vs-floor never diverges. The
    quotient is computed as ``(xs - xs % r) / r``: the dividend is then an
    exact multiple, so the float division is IEEE-exact for ANY magnitude
    (a bare ``xs / r`` cast would be one ulp from flooring the wrong way
    once coordinates outgrow the 2^52 exact-integer range of doubles).
    """

    return (grid.fdiv(xs, r) * F.lit(_PACK) + grid.fdiv(ys, r)).cast(
        "long"
    )


def within_distance_pairs(
    pts: DataFrame, radius: int, id_col: str = "id"
) -> DataFrame:
    """All unordered point pairs within ``radius`` (planar, integer units).

    ``pts`` must carry ``id_col`` plus integer columns ``xs``/``ys``
    shifted to be non-negative (centidegrees + 18000/9000 for lon/lat).
    Returns ``(id_a, id_b, dist2)`` with ``id_a < id_b`` and
    ``dist2 = (xa-xb)² + (ya-yb)² ≤ radius²`` — planar semantics (the
    geodesic/antimeridian cases belong to the PIP layer; an ε-join over
    a wrapped domain would pre-duplicate a ±360° ghost column here).

    Scale: one ×9 map-side explode, ONE hash equi-join on the cell key,
    zero distinct. ε controls the replication constant, never the join
    fan-out; hot cells split under AQE skew handling.
    """
    if radius < 1:
        raise ValueError(f"radius must be a positive integer, got {radius}")
    xs, ys = F.col("xs").cast("long"), F.col("ys").cast("long")
    left = pts.select(
        F.col(id_col).alias("id_a"),
        xs.alias("xa"),
        ys.alias("ya"),
        _cell(xs, ys, radius).alias("cell"),
    )
    ring = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    right = (
        pts.select(
            F.col(id_col).alias("id_b"),
            xs.alias("xb"),
            ys.alias("yb"),
            _cell(xs, ys, radius).alias("home"),
        )
        .withColumn("dx", F.explode(ring))
        .withColumn("dy", F.explode(ring))
        # replica in the neighbor cell: qualifying partners' HOME cells
        # are exactly the 3×3 block around this point's home
        .withColumn(
            "cell", F.col("home") + F.col("dx") * F.lit(_PACK) + F.col("dy")
        )
        .drop("home", "dx", "dy")
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    # SHUFFLE_HASH, build = the unreplicated side: size estimates would
    # otherwise pick a broadcast join, which runs the pair production
    # (the dominant cost — up to occupancy²·9 candidate rows) at the
    # SCAN's split parallelism instead of the cluster's; at 100 TB
    # neither side broadcasts anyway, and the per-key build is bounded
    # by cell occupancy — the bound the candidate volume already rests
    # on. Measured on the bench ε-join queries in OPTIMIZATION_r06.md.
    return (
        left.hint("SHUFFLE_HASH").join(right, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(d2 <= F.lit(radius * radius))
        .select("id_a", "id_b", d2.cast("long").alias("dist2"))
    )


def ripley_k_counts(
    pts: DataFrame, radii: tuple, id_col: str = "id"
) -> DataFrame:
    """Ripley's K-function pair counts — THE point-pattern statistic
    (clustered vs dispersed vs Poisson at each scale ``r``): for every
    rung of an increasing radius ladder, the exact number of unordered
    point pairs within that distance. The consumer derives the classic
    (uncorrected, toroidal-free) estimator K̂(r) = A·2·pair_count(r)/n²
    and compares against the Poisson expectation πr²; edge-corrected
    variants (Ripley isotropic, translation) reweight the SAME pair set
    and can be layered on the ``dist2`` column this emits internally.

    Exact-integer contract: returns one row per rung —
    ``(radius, pair_count, n_points)``, all BIGINT (distances compared
    as squared integers, never a float), so Spark, DuckDB and the brute
    reference agree bit-for-bit; vacuous rungs report an explicit 0.

    Scale shape: ONE grid-bucketed ε-join at max(radii) (the same
    ×9-replication cell equi-join as :func:`within_distance_pairs` — no
    CartesianProduct, no distinct), then each pair fans out to only the
    rungs it satisfies (map-side ≤ len(radii) amplification before a
    combinable groupBy of ≤ len(radii) rows). The 1-row point count
    rides in via a broadcast join. Nothing returns to the driver but
    the ladder itself."""
    radii = tuple(int(r) for r in radii)
    if not radii or any(r < 1 for r in radii):
        raise ValueError(f"radii must be positive integers, got {radii!r}")
    if list(radii) != sorted(set(radii)):
        raise ValueError(f"radii must be strictly increasing, got {radii!r}")
    pairs = within_distance_pairs(pts, max(radii), id_col)
    hits = (
        pairs.select(
            F.explode(F.array(*[F.lit(r) for r in radii])).alias("radius"),
            "dist2",
        )
        .filter(F.col("dist2") <= F.col("radius") * F.col("radius"))
        .groupBy("radius")
        .agg(F.count(F.lit(1)).alias("hit_count"))
    )
    ladder = pts.sparkSession.createDataFrame(
        [(r,) for r in radii], "radius long"
    )
    n = pts.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    return (
        ladder.join(hits, "radius", "left")
        .join(F.broadcast(n))
        .select(
            "radius",
            F.coalesce(F.col("hit_count"), F.lit(0))
            .cast("long")
            .alias("pair_count"),
            "n_points",
        )
    )


def variogram_bins(
    pts: DataFrame, radii: tuple, id_col: str = "id",
    value_col: str = "val",
) -> DataFrame:
    """Empirical (semi)variogram over integer-valued points — THE
    geostatistical structure function (how fast does a field decorrelate
    with distance?), the calibration input for kriging and the spatial
    complement of :func:`ripley_k_counts` (which counts pairs;
    this also sums their squared value differences).

    For each lag bin ``k`` — half-open annulus ``r_{k-1} < d ≤ r_k``
    with ``r_0 = 0``; co-located pairs (d = 0) land in bin 1 — returns
    ``(radius, n_pairs, sum_sq_diff)``: the unordered-pair count and
    Σ (v_i − v_j)², all BIGINT. The consumer divides —
    γ̂(bin) = sum_sq_diff / (2·n_pairs) — exactly the HLL/estimate
    convention: the ENGINE's contract is integer-exact state, the one
    float lives at the edge. Vacuous bins report explicit 0s.

    Scale shape: ONE grid-bucketed ε-join at max(radii) (the ×9
    replication cell equi-join — no CartesianProduct, no distinct);
    each candidate pair maps to exactly ONE bin (a CASE ladder, not a
    fan-out) before a combinable groupBy of ≤ len(radii) rows. Value
    columns ride the join as two extra longs — no back-join by id.
    """
    radii = tuple(int(r) for r in radii)
    if not radii or any(r < 1 for r in radii):
        raise ValueError(f"radii must be positive integers, got {radii!r}")
    if list(radii) != sorted(set(radii)):
        raise ValueError(f"radii must be strictly increasing, got {radii!r}")
    rmax = max(radii)
    xs, ys = F.col("xs").cast("long"), F.col("ys").cast("long")
    val = F.col(value_col).cast("long")
    left = pts.select(
        F.col(id_col).alias("id_a"),
        xs.alias("xa"),
        ys.alias("ya"),
        val.alias("va"),
        _cell(xs, ys, rmax).alias("cell"),
    )
    ring = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    right = (
        pts.select(
            F.col(id_col).alias("id_b"),
            xs.alias("xb"),
            ys.alias("yb"),
            val.alias("vb"),
            _cell(xs, ys, rmax).alias("home"),
        )
        .withColumn("dx", F.explode(ring))
        .withColumn("dy", F.explode(ring))
        .withColumn(
            "cell", F.col("home") + F.col("dx") * F.lit(_PACK) + F.col("dy")
        )
        .drop("home", "dx", "dy")
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    # first rung whose r² bounds d2 — each pair lands in exactly one bin
    bin_expr = F.lit(None).cast("long")
    for r in reversed(radii):
        bin_expr = F.when(d2 <= F.lit(r * r), F.lit(r)).otherwise(bin_expr)
    dv = F.col("va") - F.col("vb")
    # SHUFFLE_HASH, build = the unreplicated side (see
    # within_distance_pairs — same estimate-driven broadcast pitfall)
    hits = (
        left.hint("SHUFFLE_HASH").join(right, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(d2 <= F.lit(rmax * rmax))
        .select(bin_expr.alias("radius"), (dv * dv).alias("sq"))
        .groupBy("radius")
        .agg(
            F.count(F.lit(1)).alias("np"),
            F.sum("sq").alias("ss"),
        )
    )
    ladder = pts.sparkSession.createDataFrame(
        [(r,) for r in radii], "radius long"
    )
    return (
        ladder.join(hits, "radius", "left")
        .select(
            "radius",
            F.coalesce(F.col("np"), F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce(F.col("ss"), F.lit(0)).cast("long")
            .alias("sum_sq_diff"),
        )
    )


def grid_dbscan_cells(
    pts: DataFrame, eps: int, min_pts: int, max_iter: int = 50
) -> DataFrame:
    """Grid-DBSCAN: density clusters as connected components of dense cells.

    The grid relaxation of DBSCAN (CLIQUE/GriDBSCAN family): a cell of
    edge ``eps`` is *dense* when it holds ≥ ``min_pts`` points; clusters
    are the 8-connected components of dense cells. Each point in a dense
    cell inherits its component's cluster id (= the MIN dense-cell id in
    the component — deterministic, so the oracle can reproduce it).

    Returns ``(id, cell, cluster)`` for points in dense cells only (points
    in sparse cells are DBSCAN noise and are dropped).

    Scale: the component step runs on the DENSE-CELL graph — already
    aggregated, orders of magnitude smaller than the point set — via the
    same min-label-propagation + pointer-jumping loop the dedup layer
    uses (``operators/dedup.py``), O(log diameter) rounds.
    """
    from .dedup import connected_components

    xs, ys = F.col("xs").cast("long"), F.col("ys").cast("long")
    cells = pts.select(
        F.col("id"), _cell(xs, ys, eps).alias("cell")
    )
    dense = (
        cells.groupBy("cell")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= F.lit(min_pts))
        .select("cell")
    )
    ring = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    nbr = (
        dense.withColumn("dx", F.explode(ring))
        .withColumn("dy", F.explode(ring))
        .select(
            F.col("cell").alias("src"),
            (F.col("cell") + F.col("dx") * F.lit(_PACK) + F.col("dy")).alias(
                "dst"
            ),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    # edges between dense cells only (semi-join prunes ghost neighbors)
    edges = nbr.join(dense.select(F.col("cell").alias("dst")), "dst").select(
        "src", "dst"
    )
    comp = connected_components(
        edges, a_col="src", b_col="dst", max_iterations=max_iter
    ).select(F.col("doc_id").alias("cell"), F.col("cluster_id").alias("comp"))
    # connected_components only returns vertices with ≥1 edge; an ISOLATED
    # dense cell is still its own DBSCAN cluster → coalesce to self
    labeled = dense.join(comp, "cell", "left").select(
        "cell", F.coalesce("comp", "cell").alias("cluster")
    )
    return cells.join(labeled, "cell").select("id", "cell", "cluster")


#: IUGG mean Earth radius, meters
EARTH_RADIUS_M = 6_371_008.8

#: unit-sphere quantization: 1e7 quanta per radius ≈ 0.64 m resolution;
#: squared 3-D distances top out at 3·(2e7)² ≈ 1.2e15 ≪ int64
_SPHERE_SCALE = 10_000_000


def _sphere_quant(df: DataFrame, id_col: str) -> DataFrame:
    """Lift ``(lon, lat)`` degrees onto the unit sphere and quantize to
    SHIFTED NON-NEGATIVE int64 quanta (range [0, 2·scale] per axis) —
    the shared first stage of every geodesic join. Pure Catalyst trig,
    one pass, no UDF. Returns ``(_id, qx, qy, qz)``."""
    lonr, latr = F.radians(F.col("lon")), F.radians(F.col("lat"))
    S = F.lit(_SPHERE_SCALE)
    return df.select(
        F.col(id_col).alias("_id"),
        (F.round(F.cos(latr) * F.cos(lonr) * S) + S).cast("long").alias("qx"),
        (F.round(F.cos(latr) * F.sin(lonr) * S) + S).cast("long").alias("qy"),
        (F.round(F.sin(latr) * S) + S).cast("long").alias("qz"),
    )


def geodesic_pairs(
    pts: DataFrame, radius_m: float, id_col: str = "id"
) -> DataFrame:
    """Great-circle ε-join with NO pole or antimeridian special cases.

    A 2-D lon/lat grid needs ghost columns at ±180° and degenerates at
    the poles (every meridian converges). Lifting each point onto the
    unit sphere dissolves both: great-circle distance is MONOTONE in the
    3-D chord (``chord = 2·sin(d/2R)``), so "within ``radius_m`` along
    the surface" is EXACTLY "within the chord threshold through the
    Earth" — and the chord is plain Euclidean geometry, handled by the
    same grid-bucket pattern as :func:`within_distance_pairs`, one
    dimension up (×27 one-sided replication instead of ×9).

    Coordinates quantize to int64 sphere quanta (~0.64 m), so the accept
    decision is integer-exact and partition-order-independent; the trig
    runs once per row in whole-stage codegen (no UDF). Returns
    ``(id_a, id_b, dist2)`` with ``id_a < id_b`` — ``dist2`` in squared
    quanta (callers wanting meters: ``2·R·asin(√dist2 / (2·scale))``).

    Quantization blurs the threshold by ≤ ~2 quanta (~1.3 m); pairs
    farther than ``radius_m + 2 m`` never appear, pairs within
    ``radius_m - 2 m`` always do (the property tests pin this envelope).
    """
    return _geodesic_candidates(
        pts, pts, radius_m, id_col, id_col, self_join=True
    ).select(
        F.col("id_l").alias("id_a"), F.col("id_r").alias("id_b"), "dist2"
    )


def _geodesic_candidates(
    left: DataFrame,
    right: DataFrame,
    radius_m: float,
    left_id: str,
    right_id: str,
    self_join: bool = False,
) -> DataFrame:
    """Shared core of the geodesic joins: quantized sphere lift, 3-D cell
    equi-join (left home cells × right ×27 replicas), integer chord
    accept. ``self_join`` adds the ``id_l < id_r`` exactly-once predicate
    (same argument as :func:`within_distance_pairs`, one dimension up).
    Returns ``(id_l, id_r, dist2)``."""
    if radius_m <= 0:
        raise ValueError(f"radius_m must be positive, got {radius_m}")
    chord = 2.0 * math.sin(min(radius_m / EARTH_RADIUS_M, math.pi) / 2.0)
    t = chord * _SPHERE_SCALE  # threshold in quanta
    thr2 = int(math.floor(t * t))
    edge = max(1, math.ceil(t))  # cell edge ≥ threshold → 27 cells suffice

    # the 3-D cell is a THREE-COLUMN join key: per-axis indexes reach
    # 2·scale/edge (25 bits at metre radii), so a single packed int64
    # would overflow — Catalyst hashes composite keys natively anyway
    def fdiv(c: Column) -> Column:
        return grid.fdiv(c, edge)

    lhs = _sphere_quant(left, left_id).select(
        F.col("_id").alias("id_l"),
        F.col("qx").alias("xa"), F.col("qy").alias("ya"),
        F.col("qz").alias("za"),
        fdiv(F.col("qx")).alias("cx"),
        fdiv(F.col("qy")).alias("cy"),
        fdiv(F.col("qz")).alias("cz"),
    )
    ring = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    rhs = (
        _sphere_quant(right, right_id)
        .select(
            F.col("_id").alias("id_r"),
            F.col("qx").alias("xb"), F.col("qy").alias("yb"),
            F.col("qz").alias("zb"),
            fdiv(F.col("qx")).alias("hx"),
            fdiv(F.col("qy")).alias("hy"),
            fdiv(F.col("qz")).alias("hz"),
        )
        .withColumn("dx", F.explode(ring))
        .withColumn("dy", F.explode(ring))
        .withColumn("dz", F.explode(ring))
        .select(
            "id_r", "xb", "yb", "zb",
            (F.col("hx") + F.col("dx")).alias("cx"),
            (F.col("hy") + F.col("dy")).alias("cy"),
            (F.col("hz") + F.col("dz")).alias("cz"),
        )
    )
    d2 = (
        (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
        + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
        + (F.col("za") - F.col("zb")) * (F.col("za") - F.col("zb"))
    )
    # SHUFFLE_HASH, build = the unreplicated side (see
    # within_distance_pairs — same estimate-driven broadcast pitfall)
    out = lhs.hint("SHUFFLE_HASH").join(rhs, ["cx", "cy", "cz"])
    if self_join:
        out = out.filter(F.col("id_l") < F.col("id_r"))
    return out.filter(d2 <= F.lit(thr2)).select(
        "id_l", "id_r", d2.cast("long").alias("dist2")
    )


def geodesic_join(
    left: DataFrame,
    right: DataFrame,
    radius_m: float,
    left_id: str = "id",
    right_id: str = "id",
) -> DataFrame:
    """Two-relation great-circle ε-join (``(id_l, id_r, dist2)`` with
    ``dist2`` in squared sphere quanta): the geodesic counterpart of
    :func:`within_distance_join`, built on the same 3-D sphere lift as
    :func:`geodesic_pairs` — so poles and the antimeridian need no
    special cases here either. The RIGHT side is replicated ×27; pass
    the smaller/static relation there. The left side may be streaming
    (stream-static inner equi-join)."""
    return _geodesic_candidates(left, right, radius_m, left_id, right_id)


def geodesic_knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    init_radius_m: float,
    left_id: str = "id",
    right_id: str = "id",
) -> DataFrame:
    """Geodesic kNN join: each left point's ``k`` nearest right points in
    great-circle distance, via the same radius-doubling escalation as
    :func:`knn_join` (chord monotonicity makes the resolution rule carry
    over verbatim: a disc holding ≥ k candidates contains the true kNN).
    The final fallback radius is half the circumference — the whole
    planet — so points with < k reachable neighbors return all of them.
    Returns ``(id_l, id_r, dist2, rk)``; ties break by ``id_r``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if init_radius_m <= 0:
        raise ValueError(
            f"init_radius_m must be positive, got {init_radius_m}"
        )
    from pyspark.sql.window import Window

    max_radius = math.pi * EARTH_RADIUS_M
    lhs = left.select(F.col(left_id).alias("_lid"), "lon", "lat")
    out: DataFrame | None = None
    r = float(init_radius_m)
    while True:
        r = min(r, max_radius)
        cand = geodesic_join(
            lhs, right, r, left_id="_lid", right_id=right_id
        )
        win = Window.partitionBy("id_l").orderBy(
            F.col("dist2").asc(), F.col("id_r").asc()
        )
        ranked = cand.withColumn("rk", F.row_number().over(win))
        if r >= max_radius:
            out_r = ranked.filter(F.col("rk") <= k)
            out = out_r if out is None else out.unionByName(out_r)
            break
        full = ranked.filter(F.col("rk") == k).select(
            F.col("id_l").alias("_lid")
        )
        resolved = ranked.filter(F.col("rk") <= k).join(
            full, ranked["id_l"] == full["_lid"], "left_semi"
        )
        out = resolved if out is None else out.unionByName(resolved)
        lhs = lhs.join(full, "_lid", "left_anti").localCheckpoint(eager=True)
        if lhs.limit(1).count() == 0:  # bounded probe, metadata-scale
            break
        r *= 2
    return out.select(
        "id_l", "id_r", "dist2", F.col("rk").cast("int").alias("rk")
    )


def within_distance_join(
    left: DataFrame,
    right: DataFrame,
    radius: int,
    left_id: str = "id",
    right_id: str = "id",
) -> DataFrame:
    """Two-relation ε-join: every (left, right) pair within ``radius``
    (planar integer units; both sides carry non-negative ``xs``/``ys``
    like :func:`within_distance_pairs`). Returns
    ``(id_l, id_r, dist2)`` — all qualifying pairs, no ordering predicate
    needed (the relations are distinct, so there is no double-match to
    dedup: a pair matches only in the left row's home cell).

    The RIGHT side is the one replicated ×9, so pass the smaller /
    static relation there. The left side may be a STREAMING DataFrame:
    stream-static inner equi-joins are natively supported, making this
    the ingest-time "arriving geotagged pages × static POI set" operator
    with zero state store (the static side broadcasts or re-scans per
    microbatch; no watermark needed).
    """
    if radius < 1:
        raise ValueError(f"radius must be a positive integer, got {radius}")
    xs, ys = F.col("xs").cast("long"), F.col("ys").cast("long")
    lhs = left.select(
        F.col(left_id).alias("id_l"),
        xs.alias("xl"),
        ys.alias("yl"),
        _cell(xs, ys, radius).alias("cell"),
    )
    ring = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    rhs = (
        right.select(
            F.col(right_id).alias("id_r"),
            xs.alias("xr"),
            ys.alias("yr"),
            _cell(xs, ys, radius).alias("home"),
        )
        .withColumn("dx", F.explode(ring))
        .withColumn("dy", F.explode(ring))
        .withColumn(
            "cell", F.col("home") + F.col("dx") * F.lit(_PACK) + F.col("dy")
        )
        .drop("home", "dx", "dy")
    )
    d2 = (F.col("xl") - F.col("xr")) * (F.col("xl") - F.col("xr")) + (
        F.col("yl") - F.col("yr")
    ) * (F.col("yl") - F.col("yr"))
    # SHUFFLE_HASH, build = the unreplicated side (see
    # within_distance_pairs — same estimate-driven broadcast pitfall)
    return (
        lhs.hint("SHUFFLE_HASH").join(rhs, "cell")
        .filter(d2 <= F.lit(radius * radius))
        .select("id_l", "id_r", d2.cast("long").alias("dist2"))
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    init_radius: int,
    max_radius: int = 46_000,
    left_id: str = "id",
    right_id: str = "id",
) -> DataFrame:
    """k-nearest-neighbors join: for every left point, its ``k`` nearest
    right points — without a cross join, via ITERATIVE RADIUS DOUBLING
    over the ε-join.

    Round i runs :func:`within_distance_join` at radius ``init_radius·2ⁱ``
    for the points still unresolved; a left point RESOLVES when the disc
    holds ≥ k candidates (its true kNN are then inside — every closer
    point is also in the disc) or when the radius reaches ``max_radius``
    (the domain diameter: everything reachable has been seen, so points
    with < k neighbors get all they have). Ties on distance break by
    ``id_r`` ascending, so results are deterministic and partition-order
    independent.

    Scale: dense regions resolve in round 1 at the cheap radius; only
    stragglers (sparse deserts — few rows by definition) escalate, each
    escalation an equi-join restricted to the unresolved residue. The
    driver loop runs O(log(max/init)) bounded-count actions. The
    known trade: a round's candidates are re-derived rather than carried
    (carrying ALL candidates across rounds would shuffle the full
    candidate set every round; re-deriving touches only the residue).

    Returns ``(id_l, id_r, dist2, rk)`` with ``rk`` 1-based.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if init_radius < 1:
        raise ValueError(f"init_radius must be >= 1, got {init_radius}")
    from pyspark.sql.window import Window

    lhs = left.select(F.col(left_id).alias("_lid"), "xs", "ys")
    out: DataFrame | None = None
    r = init_radius
    while True:
        r = min(r, max_radius)
        cand = within_distance_join(
            lhs, right, r, left_id="_lid", right_id=right_id
        )
        win = Window.partitionBy("id_l").orderBy(
            F.col("dist2").asc(), F.col("id_r").asc()
        )
        ranked = cand.withColumn("rk", F.row_number().over(win))
        if r >= max_radius:
            resolved = ranked.filter(F.col("rk") <= k)
            out = resolved if out is None else out.unionByName(resolved)
            break
        # a point resolves when its disc holds >= k candidates
        full = ranked.filter(F.col("rk") == k).select(
            F.col("id_l").alias("_lid")
        )
        resolved = ranked.filter(F.col("rk") <= k).join(
            full, ranked["id_l"] == full["_lid"], "left_semi"
        )
        out = resolved if out is None else out.unionByName(resolved)
        lhs = lhs.join(full, "_lid", "left_anti").localCheckpoint(eager=True)
        if lhs.limit(1).count() == 0:  # bounded probe, metadata-scale
            break
        r *= 2
    return out.select(
        F.col("id_l"), F.col("id_r"), F.col("dist2"), F.col("rk").cast("int")
    )
