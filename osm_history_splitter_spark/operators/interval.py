"""Interval (range) join — match rows whose timestamps fall within a
tolerance of each other, without a non-equi join.

Spark executes a raw ``|l.ts - r.ts| <= tol`` predicate as
BroadcastNestedLoopJoin (quadratic); the scalable shape is time
bucketing, the 1-D case of the grid cell-cover join the spatial path
uses (``operators/spatial_join.py``):

1. pick a bucket width ``W >= tol`` and give every right row its bucket
   ``floor(ts / W)``;
2. every left row can only match right rows in buckets
   ``{b-1, b, b+1}`` where ``b = floor(l.ts / W)`` — explode the left
   side into those three candidate buckets (3x the LEFT rows through
   the shuffle; with a wide left payload, project to (id, ts) first and
   re-attach the payload by id after the join);
3. equi-join on the bucket (hash join, shuffle on an evenly-distributed
   integer key) and refine with the exact ``|dt| <= tol`` filter.

The same plan a Flink interval join compiles to. The refine filter runs
map-side after the hash join, so the only shuffled data is (bucket, ts,
join payload). Skew: buckets inherit the event-rate distribution; a
flash-crowd bucket can be salted by subdividing W — callers with
adversarial rates should shrink W toward tol.

Reference analog: the reference has no temporal joins; this generalizes
its bbox candidate test (``cut.hpp:34-52``) from 2-D space to the time
axis for the events table of the web-pipeline layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    tol_us: int,
    bucket_us: int | None = None,
    how: str = "inner",
    left_id: str | None = None,
) -> DataFrame:
    """Join each left row to every right row with
    ``|left_ts - right_ts| <= tol_us`` (microseconds, inclusive).

    Output = all left columns + all right columns (caller aliases clashes
    upstream) + ``__dt_us`` (right - left, microseconds). ``how='left'``
    keeps unmatched left rows with null right columns and requires
    ``left_id``, a non-null unique key column of ``left`` (the anti-join
    that recovers unmatched rows must not compare nullable payloads).
    """
    if bucket_us is None:
        bucket_us = max(tol_us, 1)
    if bucket_us < tol_us:
        raise ValueError(f"bucket_us={bucket_us} must be >= tol_us={tol_us}")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"alias overlapping columns first: {sorted(overlap)}")

    # NTZ columns cast to TIMESTAMP under the engine's fixed UTC session
    # zone (session.py), keeping the instant — parquet tables read as NTZ
    def _us(col: str):
        return F.unix_micros(F.col(col).cast("timestamp"))

    lb = F.floor(_us(left_ts) / F.lit(bucket_us))
    r_tagged = right.withColumn(
        "__bkt", F.floor(_us(right_ts) / F.lit(bucket_us))
    )
    l_tagged = left.withColumn(
        "__bkt", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    dt = _us(right_ts) - _us(left_ts)
    joined = (
        l_tagged.join(
            r_tagged,
            on=[
                l_tagged["__bkt"] == r_tagged["__bkt"],
                F.abs(dt) <= F.lit(tol_us),
            ],
            how="inner",
        )
        .drop("__bkt")
        .withColumn("__dt_us", dt)
    )
    if how == "inner":
        return joined
    if how == "left":
        if not left_id:
            raise ValueError("how='left' requires left_id")
        # re-attach left rows that matched nothing (anti-join on the narrow
        # unique key, then union with null right columns)
        matched_keys = joined.select(left_id).distinct()
        unmatched = left.join(matched_keys, on=left_id, how="left_anti")
        for c in right.columns:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(right.schema[c].dataType)
            )
        unmatched = unmatched.withColumn("__dt_us", F.lit(None).cast("long"))
        return joined.unionByName(unmatched)
    raise ValueError(f"how must be inner|left, got {how!r}")
