"""Trajectory operators: dwell (stay-point) detection and co-location.

The reference's world is static geometry; a web-scale geotagged corpus
adds the time axis — the same (user, time, position) stream the
sessionize / od-flow layer consumes (``oracle_queries.q_od_matrix``)
also answers the two classic trajectory questions:

- **Where did each user STAY?** (`dwell_segments`) — maximal runs of
  consecutive same-cell events per user (the grid-quantized stay-point
  of Li et al.'s GeoLife formulation: anchor-radius becomes cell
  membership, which keeps the statistic integer-exact and
  window-expressible — no sequential per-user Python loop).
- **Who was WHERE TOGETHER?** (`colocation_pairs`) — distinct-user
  event pairs in the same cell within a time tolerance τ — the
  co-visitation / contact graph under POI recommendation and
  epidemiology workloads.

Scale shapes:

- `dwell_segments`: ONE shuffle by user feeds the run-boundary window
  (lag + cumulative sum — the sessionize idiom with the gap rule
  swapped for a cell-change rule), then a map-side-combinable
  groupBy((user, run)) collapses each run to one row. No joins.
- `colocation_pairs`: time is bucketed at width τ; one side replicates
  to its bucket ±1 (map-side ×3), then ONE hash equi-join on
  (cell, bucket) + the exact |Δt| ≤ τ refine. Replicas occupy distinct
  buckets, so each ordered event pair matches AT MOST ONCE — exactly-
  once without a distinct (the ε-join argument transposed to the time
  axis); `user_a < user_b` de-duplicates the unordered pair. Candidate
  volume is bounded by per-(cell, bucket) occupancy — the spatial skew
  story is the grid's, not the join's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "dwell_segments",
    "colocation_pairs",
    "hausdorff_join",
    "trajectory_stats",
]


def dwell_segments(pos: DataFrame, min_events: int = 2) -> DataFrame:
    """Maximal same-cell runs per user, ≥ ``min_events`` events long.

    Input: ``(user_id, event_id, tse, cell)`` — integer epoch seconds
    ``tse``, one row per event; ``event_id`` breaks timestamp ties (the
    od-matrix ordering convention). Returns one row per dwell:
    ``(user_id, cell, enter_ts, exit_ts, n_events)``, all BIGINT —
    enter/exit are the run's first/last event times (duration =
    exit - enter; single-event runs have 0 and are dropped by the
    default ``min_events=2``).
    """
    if min_events < 1:
        raise ValueError(f"min_events must be >= 1, got {min_events}")
    w = Window.partitionBy("user_id").orderBy("tse", "event_id")
    runs = (
        pos.withColumn(
            "new_run",
            F.when(
                F.col("cell")
                == F.lag("cell", 1).over(w),
                0,
            ).otherwise(1),
        )
        .withColumn(
            "run_no",
            F.sum("new_run")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
    )
    return (
        runs.groupBy("user_id", "run_no")
        .agg(
            F.first("cell").alias("cell"),
            F.min("tse").cast("long").alias("enter_ts"),
            F.max("tse").cast("long").alias("exit_ts"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .filter(F.col("n_events") >= min_events)
        .select("user_id", "cell", "enter_ts", "exit_ts", "n_events")
    )


def colocation_pairs(pos: DataFrame, tau: int) -> DataFrame:
    """Distinct-user co-location graph: for every unordered user pair,
    how many event pairs shared a cell within ``tau`` seconds, and the
    tightest time gap seen.

    Input: ``(user_id, event_id, tse, cell)`` as in
    :func:`dwell_segments`. Returns ``(user_a, user_b, n_meetings,
    min_gap)`` with ``user_a < user_b``, all BIGINT. A "meeting" is one
    (event of a, event of b) pair with equal cells and ``|Δt| <= tau``
    (closed) — the raw pair count, so repeated co-presence weighs more,
    matching the co-visitation-strength convention.
    """
    if tau < 1:
        raise ValueError(f"tau must be a positive integer, got {tau}")
    t = F.lit(tau)
    # event ids are never consulted after bucketing: project them away so
    # the join carries only (user, time, cell, bucket) — narrower build
    # rows and pair stream (guide §2.3 "project before the exchange")
    base = pos.select(
        F.col("user_id").cast("long").alias("u"),
        F.col("tse").cast("long").alias("t"),
        "cell",
    )
    bucket = (F.col("t") - F.col("t") % t) / t
    lhs = base.select(
        F.col("u").alias("ua"),
        F.col("t").alias("ta"),
        "cell",
        bucket.cast("long").alias("tb"),
    )
    rhs = base.select(
        F.col("u").alias("ub"),
        F.col("t").alias("tb_time"),
        "cell",
        F.explode(
            F.array(
                bucket.cast("long") - 1,
                bucket.cast("long"),
                bucket.cast("long") + 1,
            )
        ).alias("tb"),
    )
    # SHUFFLE_HASH, build = the unreplicated side: the planner's size
    # estimate would otherwise pick a broadcast join, which inherits the
    # SCAN's partitioning — the pair production (the dominant cost, up to
    # occupancy² rows per (cell, bucket)) then runs at input-split
    # parallelism, not cluster parallelism. Shuffling both sides keys the
    # pair stream by (cell, bucket) across the full task count, which is
    # also the only viable strategy at 100 TB (neither side broadcasts);
    # the build side holds one bucket's events per key — occupancy-bounded,
    # the same bound the candidate volume already relies on. Measured 4x
    # on the bench colocation query (OPTIMIZATION_r06.md).
    pairs = (
        lhs.hint("SHUFFLE_HASH").join(rhs, ["cell", "tb"])
        .filter(
            (F.col("ua") < F.col("ub"))
            & (F.abs(F.col("ta") - F.col("tb_time")) <= t)
        )
        .select(
            "ua",
            "ub",
            F.abs(F.col("ta") - F.col("tb_time")).alias("gap"),
        )
    )
    return pairs.groupBy("ua", "ub").agg(
        F.count(F.lit(1)).cast("long").alias("n_meetings"),
        F.min("gap").cast("long").alias("min_gap"),
    ).select(
        F.col("ua").alias("user_a"),
        F.col("ub").alias("user_b"),
        "n_meetings",
        "min_gap",
    )


def hausdorff_join(
    pts: DataFrame, radius: int, tid_col: str = "tid"
) -> DataFrame:
    """Trajectory-similarity join: all unordered trajectory pairs whose
    symmetric Hausdorff distance is <= ``radius``, with the EXACT squared
    distance — the shape-matching primitive under trajectory clustering,
    route conflation and GPS-track dedup.

    Input: one row per trajectory point — ``(tid_col, xs, ys)`` with
    integer, non-negative coordinates (the ε-join convention of
    ``operators/neighbors.py``). Returns ``(tid_a, tid_b, h2)`` with
    ``tid_a < tid_b`` and ``h2 = H(A,B)²`` where
    ``H(A,B) = max(h(A→B), h(B→A))``, ``h(A→B) = max_{a∈A} min_{b∈B}
    |a-b|`` — all BIGINT, bit-exact vs any engine.

    Why a threshold join computes the EXACT distance: the grid candidate
    set holds every cross-trajectory point pair within ``radius``. If
    ``H(A,B) <= radius``, every point's true nearest partner is within
    ``radius``, hence among the candidates — so the per-point min (and
    the max over points) computed from candidates alone is the true
    value. If ``H(A,B) > radius``, some point has NO candidate partner,
    the coverage count falls short of the trajectory's point count, and
    the pair is (correctly) dropped. No distance beyond ``radius`` is
    ever evaluated.

    Scale shape: ONE grid-bucketed cell equi-join at ``radius`` (the ×9
    map-side replication of :func:`within_distance_pairs` — no
    CartesianProduct), then two combinable groupBys (per-(pair, point)
    min → per-pair max + coverage count) and a broadcast join against
    the per-trajectory point counts. Candidate volume is bounded by
    per-cell occupancy × 9, never by |A|·|B|; hot cells split under AQE.
    Duplicate points within a trajectory collapse (set semantics —
    Hausdorff is a set distance).
    """
    if radius < 1:
        raise ValueError(f"radius must be a positive integer, got {radius}")
    from .neighbors import _PACK, _cell

    xs, ys = F.col("xs").cast("long"), F.col("ys").cast("long")
    # set semantics: a trajectory is its point SET
    base = pts.select(
        F.col(tid_col).cast("long").alias("tid"), xs.alias("xs"),
        ys.alias("ys"),
    ).distinct()
    left = base.select(
        F.col("tid").alias("ta"),
        F.col("xs").alias("xa"),
        F.col("ys").alias("ya"),
        _cell(F.col("xs"), F.col("ys"), radius).alias("cell"),
    )
    ring = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    right = (
        base.select(
            F.col("tid").alias("tb"),
            F.col("xs").alias("xb"),
            F.col("ys").alias("yb"),
            _cell(F.col("xs"), F.col("ys"), radius).alias("home"),
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
    # each ordered (a-point, b-point) pair matches exactly once (the
    # partner's replica in a's home cell is unique), so no distinct
    # SHUFFLE_HASH, build = the unreplicated side (same rationale as
    # colocation_pairs above: a broadcast join would run the candidate
    # production at scan parallelism, and at scale neither side fits)
    cand = (
        left.hint("SHUFFLE_HASH").join(right, "cell")
        .filter(F.col("ta") < F.col("tb"))
        .filter(d2 <= F.lit(radius * radius))
        .select("ta", "tb", "xa", "ya", "xb", "yb", d2.alias("d2"))
    )
    # direction A→B: min over B per a-point, then max + coverage per pair
    mins_a = cand.groupBy("ta", "tb", "xa", "ya").agg(
        F.min("d2").alias("md")
    )
    dir_a = mins_a.groupBy("ta", "tb").agg(
        F.max("md").alias("h2a"), F.count(F.lit(1)).alias("cov_a")
    )
    mins_b = cand.groupBy("ta", "tb", "xb", "yb").agg(
        F.min("d2").alias("md")
    )
    dir_b = mins_b.groupBy("ta", "tb").agg(
        F.max("md").alias("h2b"), F.count(F.lit(1)).alias("cov_b")
    )
    counts = base.groupBy("tid").agg(F.count(F.lit(1)).alias("n"))
    return (
        dir_a.join(dir_b, ["ta", "tb"])
        .join(
            F.broadcast(counts.select(F.col("tid").alias("ta"),
                                      F.col("n").alias("na"))),
            "ta",
        )
        .join(
            F.broadcast(counts.select(F.col("tid").alias("tb"),
                                      F.col("n").alias("nb"))),
            "tb",
        )
        .filter(
            (F.col("cov_a") == F.col("na")) & (F.col("cov_b") == F.col("nb"))
        )
        .select(
            F.col("ta").cast("long").alias("tid_a"),
            F.col("tb").cast("long").alias("tid_b"),
            F.greatest("h2a", "h2b").cast("long").alias("h2"),
        )
    )


def trajectory_stats(pos: DataFrame) -> DataFrame:
    """Per-user trajectory summary — the feature vector under mobility
    modeling, bot/spider detection (impossible travel) and track QA:
    event count, time span, total movement, largest jump, and net
    first→last displacement.

    Input: ``(user_id, event_id, tse, xs, ys)`` — integer epoch seconds
    and integer planar coordinates (the ε-join convention); ``event_id``
    breaks timestamp ties. Returns one row per user —
    ``(user_id, n_events, duration, sum_step2, max_step2, net_disp2)``,
    all BIGINT: ``sum_step2``/``max_step2`` are the sum/max of SQUARED
    consecutive-step lengths and ``net_disp2`` the squared first→last
    distance — integer-exact (path length in meters = consumer-side
    sqrt, the HLL convention). Single-event users report explicit 0s.

    Scale shape: ONE shuffle by user feeds the lag window, both
    first/last marks (the od-matrix dual row_number idiom — no
    self-join) and the final groupBy — Catalyst reuses the same hash
    partitioning for all four, so the whole statistic is one Exchange
    plus a map-side-combinable agg. No joins, no UDFs.
    """
    w = Window.partitionBy("user_id").orderBy("tse", "event_id")
    wd = Window.partitionBy("user_id").orderBy(
        F.col("tse").desc(), F.col("event_id").desc()
    )
    xs, ys = F.col("xs").cast("long"), F.col("ys").cast("long")
    dx = xs - F.lag("xs", 1).over(w)
    dy = ys - F.lag("ys", 1).over(w)
    marked = pos.select(
        "user_id",
        F.col("tse").cast("long").alias("tse"),
        xs.alias("xs"),
        ys.alias("ys"),
        (dx * dx + dy * dy).alias("step2"),
        F.row_number().over(w).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    first_of = lambda c: F.max(F.when(F.col("rn_a") == 1, c))  # noqa: E731
    last_of = lambda c: F.max(F.when(F.col("rn_d") == 1, c))  # noqa: E731
    ndx = last_of(F.col("xs")) - first_of(F.col("xs"))
    ndy = last_of(F.col("ys")) - first_of(F.col("ys"))
    return marked.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (last_of(F.col("tse")) - first_of(F.col("tse")))
        .cast("long")
        .alias("duration"),
        F.coalesce(F.sum("step2"), F.lit(0))
        .cast("long")
        .alias("sum_step2"),
        F.coalesce(F.max("step2"), F.lit(0))
        .cast("long")
        .alias("max_step2"),
        (ndx * ndx + ndy * ndy).cast("long").alias("net_disp2"),
    )
