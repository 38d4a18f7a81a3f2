"""As-of (point-in-time) join — an operator Spark lacks natively.

For every left row, attach the payload of the latest right row with the
same key and ``right_ts <= left_ts``. The naive formulation is a range
join (quadratic per key); the scalable shape used here is the
union-window trick:

1. union the two inputs with an ``is_right`` tag (right rows carry the
   payload, left rows carry null);
2. one window per key ordered by (ts, is_right DESC) — a right row sorts
   before a left row at the same timestamp, giving ``<=`` semantics;
3. ``last(struct(payloads), ignorenulls=true)`` over the running frame
   assigns each left row the most recent right row AS A UNIT — the struct
   is non-null for every right row even when individual payload values are
   NULL, so a null payload is attached (matching DuckDB ``ASOF JOIN``)
   rather than skipped for a stale older one, and multi-column payloads
   can never mix values from different right rows;
4. filter back to left rows and unpack the struct.

One shuffle (the window partitioning), no join at all — the same plan
Flink's temporal join and kdb's aj compile to. The DuckDB oracle uses its
NATIVE ``ASOF JOIN`` operator, so the equivalence check crosses two
independent implementations.

Skew note: the window partitions by key; a pathologically hot key (one
user with 10^9 events) serializes inside one partition — pre-split such
keys by time range and stitch, or use the bucketed variant. Normal
training-data keys (url, user) are fine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join; output = left columns + payload columns (null when
    no right row precedes). ``right`` must be unique per (on, right_ts) —
    dedup upstream to make the match deterministic."""
    lcols = left.columns
    overlap = [c for c in payload_cols if c in lcols]
    if overlap:
        raise ValueError(
            f"payload_cols {overlap} collide with left columns — alias "
            "them on the right side first (interval_join convention)"
        )
    # a NULL right_ts can never satisfy right_ts <= left_ts: drop such
    # rows, else asc-nulls-first ordering would attach their payload to
    # EVERY left row (diverging from the DuckDB ASOF oracle)
    right = right.filter(F.col(right_ts).isNotNull())
    l_tag = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__is_right", F.lit(0))
        .withColumn(
            "__p",
            F.lit(None).cast(
                "struct<" + ",".join(
                    f"{c}:{right.schema[c].dataType.simpleString()}"
                    for c in payload_cols
                ) + ">"
            ),
        )
    )
    # the payload struct is NEVER null on a right row (struct() of nullable
    # fields is non-null), so last(ignorenulls) skips only left rows
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        F.struct(*payload_cols).alias("__p"),
    )
    for c in lcols:
        if c not in on and c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tag.select(*lcols, "__p", "__ts", "__is_right").unionByName(
        r_tag.select(*lcols, "__p", "__ts", "__is_right")
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *lcols,
        "__is_right",
        F.last("__p", ignorenulls=True).over(w).alias("__p"),
    )
    return filled.filter(F.col("__is_right") == 0).select(
        *lcols, *[F.col(f"__p.{c}").alias(c) for c in payload_cols]
    )
