"""Adaptive quadtree partitioner (operators/partitioner.py).

Certifies the three promises: BALANCE under heavy skew (no partition far
above target), LOCALITY (partitions are disjoint Z-curve spans — each is
a quadtree block), and determinism of the sampled plan.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_history_splitter_spark.functions import grid
from osm_history_splitter_spark.operators.partitioner import (
    QuadtreePartitioner,
    quadtree_partitioner,
)


def _skewed_cloud(spark, n=20_000, hot_frac=0.9, seed=3):
    """90% of points inside a 0.2°×0.2° hotspot, 10% uniform planet-wide —
    the city-center skew a uniform grid partitioner dies on."""
    rng = np.random.default_rng(seed)
    n_hot = int(n * hot_frac)
    lon = np.concatenate(
        [11.5 + rng.random(n_hot) * 0.2, rng.random(n - n_hot) * 360 - 180]
    )
    lat = np.concatenate(
        [48.1 + rng.random(n_hot) * 0.2, rng.random(n - n_hot) * 180 - 90]
    )
    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(zip(lon, lat))]
    return spark.createDataFrame(rows, "id long, lon double, lat double")


def test_balance_under_skew(spark):
    df = _skewed_cloud(spark)
    target = 1000
    part = quadtree_partitioner(df, target_rows=target)
    assert part.num_partitions >= 10  # the hotspot actually split
    out = part.apply(df)
    sizes = (
        out.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .toPandas()["count"]
    )
    assert sizes.sum() == 20_000
    # quadtree leaves hold ≤ cap in the SAMPLE; true counts can exceed the
    # target by the sampling error + the 4× split granularity, never by
    # the 18000× a uniform grid would show on this cloud
    assert sizes.max() <= 4 * target


def test_partitions_are_disjoint_curve_spans(spark):
    df = _skewed_cloud(spark, n=5_000, seed=11)
    part = quadtree_partitioner(df, target_rows=400)
    out = part.apply(df)
    z = grid.zorder_expr(F.col("lon"), F.col("lat"), part.res)
    spans = (
        out.select(F.spark_partition_id().alias("p"), z.alias("z"))
        .groupBy("p")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    for a, b in zip(spans, spans[1:]):
        assert a.hi < b.lo  # locality: no interleaving between partitions


def test_pid_exhaustive_and_in_range(spark):
    df = _skewed_cloud(spark, n=3_000, seed=5)
    part = quadtree_partitioner(df, target_rows=200)
    pids = df.select(
        part.pid_column(F.col("lon"), F.col("lat")).alias("pid")
    ).toPandas()["pid"]
    assert pids.min() >= 0
    assert pids.max() < part.num_partitions
    assert len(pids) == 3_000


def test_plan_is_deterministic(spark):
    df = _skewed_cloud(spark, n=4_000, seed=9)
    a = quadtree_partitioner(df, target_rows=300, seed=13)
    b = quadtree_partitioner(df, target_rows=300, seed=13)
    assert a == b


def test_empty_and_validation(spark):
    empty = spark.createDataFrame([], "id long, lon double, lat double")
    part = quadtree_partitioner(empty, target_rows=10)
    assert part.num_partitions == 1
    with pytest.raises(ValueError):
        quadtree_partitioner(empty, target_rows=0)


def test_plan_reuse_across_frames(spark):
    # one sampled plan lays out a SECOND frame with the same geography —
    # the multi-table publish case (nodes plan reused for ways' centroids)
    df = _skewed_cloud(spark, n=6_000, seed=21)
    part = quadtree_partitioner(df, target_rows=500)
    other = _skewed_cloud(spark, n=2_000, seed=22)
    out = part.apply(other)
    assert out.count() == 2_000
    assert isinstance(part, QuadtreePartitioner)
