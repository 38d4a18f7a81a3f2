"""Hilbert curve key (functions/grid.py:hilbert_*).

Three independent twins must agree bit-for-bit: the numpy kernel (drives
the pandas UDF), the Spark expression (quantize in Catalyst + Arrow
kernel), and the DuckDB chained-CTE unroll (the oracle). Plus the two
properties that make Hilbert worth shipping next to Morton: exact
roundtrip through d2xy, and seam-free adjacency — consecutive keys are
ALWAYS Chebyshev-adjacent cells, which Morton provably violates.
Driver-gate parity for the `hilbert` query runs in
tests/test_driver_excluded.py.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_history_splitter_spark.functions.grid import (
    hilbert_d2xy_np,
    hilbert_expr,
    hilbert_np,
    hilbert_sql_query,
    zorder_expr,
)


@pytest.mark.parametrize("res", [1, 5, 12, 15])
def test_roundtrip_and_range(res):
    rng = np.random.default_rng(res)
    side = 1 << res
    x = rng.integers(0, side, 4000)
    y = rng.integers(0, side, 4000)
    d = hilbert_np(x, y, res)
    assert d.min() >= 0 and d.max() < side * side
    x2, y2 = hilbert_d2xy_np(d, res)
    assert (x2 == x).all() and (y2 == y).all()


def test_full_grid_bijection_and_adjacency():
    # res 5: every one of the 1024 cells appears exactly once along the
    # curve, and every consecutive pair is a lattice step of length 1
    res, side = 5, 32
    xs, ys = hilbert_d2xy_np(np.arange(side * side), res)
    assert len(set(zip(xs.tolist(), ys.tolist()))) == side * side
    step = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
    assert (step == 1).all(), "Hilbert curve has a seam?!"


def test_morton_has_seams_hilbert_does_not():
    # the locality claim made concrete: the largest coordinate jump
    # between consecutive keys is 1 for Hilbert, but grows with the
    # domain for Morton (the block-boundary seam)
    res, side = 6, 64
    xs, ys = hilbert_d2xy_np(np.arange(side * side), res)
    assert int(np.max(np.abs(np.diff(xs)) + np.abs(np.diff(ys)))) == 1
    # Morton order of the same grid: sort cells by interleaved bits
    gx, gy = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    gx, gy = gx.ravel(), gy.ravel()

    def spread(v):
        v = v.astype(np.int64)
        out = np.zeros_like(v)
        for b in range(16):
            out |= ((v >> b) & 1) << (2 * b)
        return out

    z = spread(gx) | (spread(gy) << 1)
    order = np.argsort(z)
    seam = int(
        np.max(
            np.abs(np.diff(gx[order])) + np.abs(np.diff(gy[order]))
        )
    )
    assert seam > side // 2  # Morton's worst step spans half the domain


def test_spark_expr_matches_numpy_kernel(spark):
    rng = np.random.default_rng(7)
    n = 3000
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-90, 90, n)
    # include the exact domain edges the clamp exists for
    lon[:2], lat[:2] = [180.0, -180.0], [90.0, -90.0]
    df = spark.createDataFrame(pd.DataFrame({"id": np.arange(n), "lon": lon, "lat": lat}))
    got = (
        df.select("id", hilbert_expr(F.col("lon"), F.col("lat"), 12).alias("h"))
        .toPandas()
        .sort_values("id")["h"]
        .to_numpy()
    )
    side = 1 << 12
    ix = np.minimum(np.floor((lon + 180.0) / (360.0 / side)).astype(np.int64), side - 1)
    iy = np.minimum(np.floor((lat + 90.0) / (180.0 / side)).astype(np.int64), side - 1)
    assert (got == hilbert_np(ix, iy, 12)).all()


def test_duckdb_sql_twin_matches_kernel():
    rng = np.random.default_rng(11)
    n = 2000
    pdf = pd.DataFrame(
        {
            "id": np.arange(n),
            "lon": rng.uniform(-180, 180, n),
            "lat": rng.uniform(-90, 90, n),
        }
    )
    con = duckdb.connect()
    con.register("pts_tbl", pdf)
    q = hilbert_sql_query("SELECT id, lon, lat FROM pts_tbl", 12)
    got = con.execute(q).df().sort_values("id")["h"].to_numpy()
    side = 1 << 12
    ix = np.minimum(
        np.floor((pdf.lon.to_numpy() + 180.0) / (360.0 / side)).astype(np.int64),
        side - 1,
    )
    iy = np.minimum(
        np.floor((pdf.lat.to_numpy() + 90.0) / (180.0 / side)).astype(np.int64),
        side - 1,
    )
    assert (got == hilbert_np(ix, iy, 12)).all()


def test_file_stat_pruning_beats_morton(spark):
    # the operational claim: range-partition a point set into "files" by
    # each key and compare per-file cell-bbox areas — tighter boxes mean
    # more min/max pruning. Hilbert's total box area must not exceed
    # Morton's on a uniform cloud (it's typically ~30% smaller).
    rng = np.random.default_rng(3)
    n, files, res = 20000, 16, 10
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-90, 90, n)
    side = 1 << res
    ix = np.minimum(np.floor((lon + 180.0) / (360.0 / side)).astype(np.int64), side - 1)
    iy = np.minimum(np.floor((lat + 90.0) / (180.0 / side)).astype(np.int64), side - 1)
    h = hilbert_np(ix, iy, res)

    def spread(v):
        out = np.zeros_like(v)
        for b in range(16):
            out |= ((v >> b) & 1) << (2 * b)
        return out

    z = spread(ix) | (spread(iy) << 1)

    def total_box_area(key):
        order = np.argsort(key, kind="stable")
        area = 0
        for chunk in np.array_split(order, files):
            area += (ix[chunk].max() - ix[chunk].min() + 1) * (
                iy[chunk].max() - iy[chunk].min() + 1
            )
        return int(area)

    assert total_box_area(h) <= total_box_area(z)


def test_res_validation():
    with pytest.raises(ValueError):
        hilbert_sql_query("SELECT 1", 16)
    with pytest.raises(ValueError):
        hilbert_sql_query("SELECT 1", 0)
