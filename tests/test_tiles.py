"""Slippy-map XYZ tiles + quadkey: differential vs an independent
asinh-form reference (the OSM-wiki math written via math.asinh instead of
the ln(tan+sec) chain), SQL-twin equality, and the published Bing example."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from osm_history_splitter_spark.functions.grid import (  # noqa: E402
    quadkey_sql,
    tile_xy_sql,
)

MAX_LAT = 85.05112877980659


def ref_tile(lat: float, lon: float, z: int) -> tuple[int, int]:
    """Independent reference: asinh form, scalar math module."""
    n = 1 << z
    x = int(math.floor((lon + 180.0) / 360.0 * n))
    lat = min(max(lat, -MAX_LAT), MAX_LAT)
    y = int(
        math.floor((1.0 - math.asinh(math.tan(math.radians(lat))) / math.pi) / 2.0 * n)
    )
    return min(max(x, 0), n - 1), min(max(y, 0), n - 1)


def ref_quadkey(lat: float, lon: float, z: int) -> str:
    x, y = ref_tile(lat, lon, z)
    out = []
    for i in range(z, 0, -1):
        d = 0
        mask = 1 << (i - 1)
        if x & mask:
            d += 1
        if y & mask:
            d += 2
        out.append(str(d))
    return "".join(out)


def _duck(lon, lat, z):
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", list(zip(lon, lat)))
    tx, ty = tile_xy_sql("lon", "lat", z)
    qk = quadkey_sql("lon", "lat", z)
    return con.execute(f"SELECT {tx}, {ty}, {qk} FROM pts").fetchall()


def test_anchor_tiles():
    # exact anchors of the XYZ scheme: the origin corner, the greenwich/
    # equator center tile, and the mercator clamp row
    assert ref_tile(MAX_LAT, -180.0, 3) == (0, 0)
    assert ref_tile(0.0, 0.0, 3) == (4, 4)  # (n/2, n/2) at any zoom
    assert ref_tile(-MAX_LAT, 179.99, 3) == (7, 7)
    got = _duck([-180.0, 0.0, 179.99], [MAX_LAT, 0.0, -MAX_LAT], 3)
    assert [(g[0], g[1]) for g in got] == [(0, 0), (4, 4), (7, 7)]
    # quadkey digit packing: NW corner all '0', SE corner all '3',
    # center tile of z1=SE quadrant then NW sub-quadrants
    assert got[0][2] == "000"
    assert got[2][2] == "333"
    assert got[1][2] == "300"


def test_sql_matches_reference_lattice():
    # the part_nodes lattice: lon/lat on 0.01-degree steps, full range
    rng = np.random.default_rng(13)
    lon = (rng.integers(0, 36000, 400) / 100.0 - 180.0).tolist()
    lat = (rng.integers(0, 18000, 400) / 100.0 - 90.0).tolist()
    lon += [-180.0, 180.0, 0.0, -168.75]  # -168.75 is an exact x boundary
    lat += [90.0, -90.0, 0.0, 85.06]
    for z in (3, 8, 12):
        got = _duck(lon, lat, z)
        for (gx, gy, gq), lo, la in zip(got, lon, lat):
            assert (gx, gy) == ref_tile(la, lo, z), (lo, la, z)
            assert gq == ref_quadkey(la, lo, z), (lo, la, z)


def test_spark_expr_matches_sql(spark):
    import pyspark.sql.functions as F

    from osm_history_splitter_spark.functions.grid import (
        quadkey_expr,
        tile_xy_expr,
    )

    rng = np.random.default_rng(17)
    lon = (rng.integers(0, 36000, 300) / 100.0 - 180.0).tolist()
    lat = (rng.integers(0, 18000, 300) / 100.0 - 90.0).tolist()
    df = spark.createDataFrame(list(zip(lon, lat)), "lon double, lat double")
    tx, ty = tile_xy_expr(F.col("lon"), F.col("lat"), 8)
    got = df.select(
        tx.alias("x"), ty.alias("y"), quadkey_expr(F.col("lon"), F.col("lat"), 8)
    ).collect()
    want = _duck(lon, lat, 8)
    assert [(r[0], r[1], r[2]) for r in got] == [tuple(w) for w in want]


def test_quadkey_prefix_is_ancestry():
    # zooming out = truncating the quadkey (the prefix-filter property)
    for lat, lon in [(41.85, -87.65), (-33.9, 151.2), (85.0, 179.99)]:
        q12 = ref_quadkey(lat, lon, 12)
        for z in (3, 8):
            assert ref_quadkey(lat, lon, z) == q12[:z]


def test_bad_zoom_rejected():
    with pytest.raises(ValueError):
        quadkey_sql("lon", "lat", 0)
    with pytest.raises(ValueError):
        quadkey_sql("lon", "lat", 17)
