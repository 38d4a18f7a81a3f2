"""SparkSession factory tuned for the sandbox (local[N]) but written so the
same settings are what you would ship to a 1000-executor cluster:

- AQE on (adaptive shuffle partitions, broadcast conversion, skew-join split)
- Arrow on (all custom operators are pandas-UDF / Arrow batched)
- shuffle partitions sized to the parallelism level, not the 200 default
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def parallelize_scan(df: DataFrame) -> DataFrame:
    """Fan a narrow scan out to cluster parallelism — scale-adaptive.

    A single-file, single-row-group parquet plans as ONE scan task no
    matter the split config (a row group is the smallest readable unit),
    so every per-row computation downstream of such a scan runs on one
    core until the first exchange. When the planned scan partition count
    is below the session's default parallelism, round-robin repartition
    to it: the shuffle moves the (small, by construction) table once and
    unlocks N-way downstream compute. At scale the guard disables this —
    a big corpus scan already plans >= cores partitions, and the
    repartition would be a pure-overhead full shuffle of the corpus
    (guide §2.5 input skew / §6 input split sizing).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def get_spark(
    app_name: str = "splitter-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
        .config("spark.executor.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
