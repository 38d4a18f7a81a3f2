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

__all__ = ["dwell_segments", "colocation_pairs"]


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
    base = pos.select(
        F.col("user_id").cast("long").alias("u"),
        F.col("event_id").cast("long").alias("e"),
        F.col("tse").cast("long").alias("t"),
        "cell",
    )
    bucket = (F.col("t") - F.col("t") % t) / t
    lhs = base.select(
        F.col("u").alias("ua"),
        F.col("e").alias("ea"),
        F.col("t").alias("ta"),
        "cell",
        bucket.cast("long").alias("tb"),
    )
    rhs = base.select(
        F.col("u").alias("ub"),
        F.col("e").alias("eb"),
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
    pairs = (
        lhs.join(rhs, ["cell", "tb"])
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
