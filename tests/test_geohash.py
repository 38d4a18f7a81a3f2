"""Geohash encode: three-way twin equality (Catalyst expr == SQL fragment ==
numpy reference) plus a differential against the classic bisection algorithm
(the published geohash.org procedure) and the textbook ``u4pruy`` fixture."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from osm_history_splitter_spark.functions.grid import (  # noqa: E402
    GEOHASH_ALPHABET,
    geohash_np,
    geohash_sql,
)


def classic_geohash(lat: float, lon: float, precision: int) -> str:
    """Reference implementation: the original interval-bisection procedure
    (longitude bit first), independent of the Morton-spread encode."""
    lat_i, lon_i = (-90.0, 90.0), (-180.0, 180.0)
    bits: list[int] = []
    even = True
    while len(bits) < 5 * precision:
        if even:
            mid = (lon_i[0] + lon_i[1]) / 2
            if lon >= mid:
                bits.append(1)
                lon_i = (mid, lon_i[1])
            else:
                bits.append(0)
                lon_i = (lon_i[0], mid)
        else:
            mid = (lat_i[0] + lat_i[1]) / 2
            if lat >= mid:
                bits.append(1)
                lat_i = (mid, lat_i[1])
            else:
                bits.append(0)
                lat_i = (lat_i[0], mid)
        even = not even
    out = []
    for i in range(precision):
        g = 0
        for b in bits[5 * i : 5 * i + 5]:
            g = g * 2 + b
        out.append(GEOHASH_ALPHABET[g])
    return "".join(out)


def test_published_fixture():
    # the geohash.org example point: 57.64911, 10.40744 -> u4pruydqqvj
    assert geohash_np(np.array([10.40744]), np.array([57.64911]), 6)[0] == "u4pruy"
    assert (
        geohash_np(np.array([10.40744]), np.array([57.64911]), 10)[0]
        == "u4pruydqqv"
    )


@settings(max_examples=200, deadline=None)
@given(
    lat=st.floats(min_value=-90.0, max_value=90.0, allow_nan=False),
    lon=st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
    precision=st.sampled_from([2, 4, 6, 8, 12]),
)
def test_np_matches_classic(lat, lon, precision):
    got = geohash_np(np.array([lon]), np.array([lat]), precision)[0]
    # the domain edge clamps into the last cell; the bisection reference
    # does the same because >= always picks the upper half at the edge
    assert got == classic_geohash(lat, lon, precision)


def test_sql_twin_matches_np():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    lon = np.concatenate([lon, [-180.0, 180.0, 0.0, 179.999999]])
    lat = np.concatenate([lat, [-90.0, 90.0, 0.0, 89.999999]])
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(lon DOUBLE, lat DOUBLE)")
    con.executemany(
        "INSERT INTO pts VALUES (?, ?)", list(zip(lon.tolist(), lat.tolist()))
    )
    for p in (4, 6, 12):
        got = [
            r[0]
            for r in con.execute(
                f"SELECT {geohash_sql('lon', 'lat', p)} FROM pts"
            ).fetchall()
        ]
        assert got == geohash_np(lon, lat, p)


def test_spark_expr_matches_np(spark):
    import pyspark.sql.functions as F

    from osm_history_splitter_spark.functions.grid import geohash_expr

    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 180, 100)
    lat = rng.uniform(-90, 90, 100)
    df = spark.createDataFrame(
        list(zip(lon.tolist(), lat.tolist())), "lon double, lat double"
    )
    got = [
        r[0]
        for r in df.select(
            geohash_expr(F.col("lon"), F.col("lat"), 6)
        ).collect()
    ]
    assert got == geohash_np(lon, lat, 6)


def test_bad_precision_rejected():
    with pytest.raises(ValueError):
        geohash_np(np.array([0.0]), np.array([0.0]), 5)
    with pytest.raises(ValueError):
        geohash_np(np.array([0.0]), np.array([0.0]), 14)
