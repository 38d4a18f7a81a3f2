"""Hex binning (functions/grid.py:hexbin_*): the Catalyst expression must
equal the CPython reference bit-for-bit (CPython floats are IEEE doubles
— any divergence means Spark reordered or fused float arithmetic), hex
centers must round-trip to their own bin, and mapped points must lie
within one circumradius of their bin's center. The DuckDB twin is
certified in tests/test_driver_excluded.py (`hexbin_assign`)."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from osm_history_splitter_spark.functions.grid import (  # noqa: E402
    hexbin_expr,
    hexbin_py,
)

SIZE = 2.0


def _rand_pts(seed, n):
    rng = np.random.default_rng(seed)
    # centidegree lattice — the corpus convention — plus raw uniform
    lon = np.concatenate(
        [
            rng.integers(0, 36000, n // 2) / 100.0 - 180.0,
            rng.uniform(-180, 180, n - n // 2),
        ]
    )
    lat = np.concatenate(
        [
            rng.integers(0, 18000, n // 2) / 100.0 - 90.0,
            rng.uniform(-90, 90, n - n // 2),
        ]
    )
    return [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(lon, lat))]


@pytest.mark.parametrize("seed,n", [(21, 4000), (22, 4000)])
def test_hexbin_expr_matches_python_reference(spark, seed, n):
    rows = _rand_pts(seed, n)
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    hq, hr = hexbin_expr(F.col("lon"), F.col("lat"), SIZE)
    got = {
        r.id: (r.hq, r.hr)
        for r in df.select("id", hq.alias("hq"), hr.alias("hr")).collect()
    }
    want = {i: hexbin_py(lon, lat, SIZE) for i, lon, lat in rows}
    assert got == want
    # the fixture must exercise both cube-round fix-up branches
    fixed = {v for v in want.values()}
    assert len(fixed) > 50


def _center(hq: int, hr: int):
    lat = hr * 1.5 * SIZE - 90.0
    lon = (hq + hr / 2.0) * math.sqrt(3.0) * SIZE - 180.0
    return lon, lat


def test_hexbin_centers_roundtrip():
    for hq in range(-5, 60, 7):
        for hr in range(0, 60, 11):
            lon, lat = _center(hq, hr)
            if not (-180 <= lon <= 180 and -90 <= lat <= 90):
                continue
            assert hexbin_py(lon, lat, SIZE) == (hq, hr)


def test_hexbin_points_within_circumradius():
    rows = _rand_pts(5, 2000)
    for _i, lon, lat in rows:
        hq, hr = hexbin_py(lon, lat, SIZE)
        clon, clat = _center(hq, hr)
        d = math.hypot(lon - clon, lat - clat)
        assert d <= SIZE * 1.0000001, (lon, lat, hq, hr, d)
