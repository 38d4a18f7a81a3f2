"""Tile materialization: batch and streaming writers produce identical row
sets under the quadkey-prefix directory layout, and the layout is what the
docstring promises (bounded fan-out, ancestry-prefix keys)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from osm_history_splitter_spark.plans.tiles import (  # noqa: E402
    tile_stream,
    with_tile_keys,
    write_tiles,
)

Z = 8
PREFIX = 3


def _pts(spark, n=500):
    return spark.range(n).select(
        F.col("id"),
        (((F.col("id") * 7919) % 36000) / F.lit(100.0) - F.lit(180.0)).alias("lon"),
        (((F.col("id") * 104729) % 18000) / F.lit(100.0) - F.lit(90.0)).alias("lat"),
    )


def test_batch_write_layout(spark, tmp_path):
    out = str(tmp_path / "tiles")
    write_tiles(_pts(spark), Z, out, prefix_len=PREFIX)
    back = spark.read.parquet(out)
    # partition dirs = distinct z-3 prefixes, bounded by 4^3
    dirs = [p.name for p in Path(out).iterdir() if p.name.startswith("tile_prefix=")]
    assert 0 < len(dirs) <= 4**PREFIX
    # prefix is derivable from qk (partition column round-trips consistently)
    bad = back.filter(
        F.substring(F.col("qk"), 1, PREFIX) != F.col("tile_prefix")
    ).count()
    assert bad == 0
    # keys match a direct recomputation
    expect = with_tile_keys(_pts(spark), Z, PREFIX)
    assert (
        back.select("id", "tx", "ty", "qk").exceptAll(
            expect.select("id", "tx", "ty", "qk")
        ).count()
        == 0
    )
    assert back.count() == 500


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    _pts(spark).coalesce(4).write.parquet(src)
    stream = (
        spark.readStream.schema("id long, lon double, lat double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "stream_tiles")
    q = tile_stream(
        stream, Z, out, str(tmp_path / "ckpt"), prefix_len=PREFIX
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).select("id", "tx", "ty", "qk", "tile_prefix")
    batch_out = str(tmp_path / "batch_tiles")
    write_tiles(_pts(spark), Z, batch_out, prefix_len=PREFIX)
    want = spark.read.parquet(batch_out).select(
        "id", "tx", "ty", "qk", "tile_prefix"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bad_prefix_rejected(spark):
    with pytest.raises(ValueError):
        with_tile_keys(_pts(spark), Z, 0)
    with pytest.raises(ValueError):
        with_tile_keys(_pts(spark), Z, Z + 1)
