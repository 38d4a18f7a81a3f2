"""Unit tests for the numpy geometry/grid core (no Spark)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_history_splitter_spark.functions.geometry import (
    close_ring,
    points_in_rings,
    points_on_boundary,
)
from osm_history_splitter_spark.functions import grid

SQUARE = [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)]
SQUARE_WITH_HOLE = SQUARE + [
    np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], dtype=float)
]
DIAMOND = [np.array([[2, 0], [4, 2], [2, 4], [0, 2], [2, 0]], dtype=float)]


def pip(lon, lat, rings):
    return points_in_rings(np.array([lon]), np.array([lat]), rings)[0]


class TestPointInRings:
    def test_interior(self):
        assert pip(2, 2, SQUARE)
        assert pip(0.5, 0.5, SQUARE_WITH_HOLE)

    def test_exterior(self):
        assert not pip(5, 2, SQUARE)
        assert not pip(-1, -1, SQUARE)

    def test_hole_is_out(self):
        # .poly '!'-ring semantics (reference geometryreader.hpp:159,186-189)
        assert not pip(2, 2, SQUARE_WITH_HOLE)

    def test_boundary_is_out(self):
        # interior-only (reference cut.hpp:42-49: GEOS INTERIOR location)
        assert not pip(0, 2, SQUARE)       # edge
        assert not pip(0, 0, SQUARE)       # vertex
        assert not pip(2, 4, SQUARE)       # top edge
        assert not pip(3, 3, DIAMOND)      # diagonal edge midpoint
        assert not pip(1, 2, SQUARE_WITH_HOLE)  # hole boundary

    def test_auto_close(self):
        open_ring = [np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)]
        assert pip(2, 2, [close_ring(open_ring[0])])

    def test_two_outers(self):
        # OSM-kind: every closed way an outer (reference README.md:84)
        two = [SQUARE[0], SQUARE[0] + 10.0]
        assert pip(2, 2, two)
        assert pip(12, 12, two)
        assert not pip(7, 7, two)

    @given(
        st.floats(-0.5, 4.5, allow_nan=False),
        st.floats(-0.5, 4.5, allow_nan=False),
    )
    @settings(max_examples=300, deadline=None)
    def test_diamond_matches_halfplane(self, x, y):
        """General even-odd PIP == convex half-plane test (strict interior)."""
        verts = DIAMOND[0]
        strict = all(
            (verts[i + 1, 0] - verts[i, 0]) * (y - verts[i, 1])
            - (verts[i + 1, 1] - verts[i, 1]) * (x - verts[i, 0])
            > 0
            for i in range(4)
        )
        assert pip(x, y, DIAMOND) == strict


class TestGrid:
    def test_cell_roundtrip(self):
        cells = grid.cell_ids_np(np.array([8.2, -179.9]), np.array([49.7, -89.9]), 10)
        assert cells.dtype == np.int64
        w = grid.cell_width(10)
        ix = cells[0] // grid.CELL_SHIFT
        iy = cells[0] % grid.CELL_SHIFT
        assert ix * w - 180.0 <= 8.2 < (ix + 1) * w - 180.0
        assert iy * w - 90.0 <= 49.7 < (iy + 1) * w - 90.0

    def test_cover_bbox_classification(self):
        cells, fully = grid.cover_bbox(0.0, 0.0, 4.0, 4.0, 7)  # w=1.40625
        assert len(cells) > 0
        w = grid.cell_width(7)
        for c, f in zip(cells, fully):
            ix, iy = divmod(int(c), grid.CELL_SHIFT)
            lo_x, lo_y = ix * w - 180.0, iy * w - 90.0
            inside = lo_x > 0 and lo_x + w < 4 and lo_y > 0 and lo_y + w < 4
            assert f == inside

    def test_cover_rings_sound(self):
        """Every point inside the polygon must land in a covered cell; every
        fully_inside cell must contain only interior points."""
        res = 8
        cells, fully = grid.cover_rings(DIAMOND, res)
        cellset = dict(zip(cells.tolist(), fully.tolist()))
        rng = np.random.default_rng(7)
        lon = rng.uniform(-1, 5, 4000)
        lat = rng.uniform(-1, 5, 4000)
        inside = points_in_rings(lon, lat, DIAMOND)
        pt_cells = grid.cell_ids_np(lon, lat, res)
        for i in range(4000):
            c = int(pt_cells[i])
            if inside[i]:
                assert c in cellset  # soundness: no inside point missed
            if cellset.get(c, False):  # fully_inside => must be interior
                assert inside[i]

    def test_pick_res_bounds_cover(self):
        res = grid.pick_res(-180, -90, 180, 90, max_cells=4096)
        xs_ys = grid._cells_for_span(-180, -90, 180, 90, res)
        assert len(xs_ys[0]) * len(xs_ys[1]) <= 4096

    def test_neighbor_ring(self):
        c = grid.cell_ids_np(np.array([10.0]), np.array([10.0]), 10)[0]
        ring = grid.neighbor_ring(c, 1)
        assert len(ring) == 9
        assert c in ring.tolist()


class TestBoundaryDetection:
    def test_on_vertex_and_edge(self):
        on = points_on_boundary(
            np.array([0.0, 2.0, 2.0, 5.0]),
            np.array([0.0, 0.0, 2.0, 5.0]),
            SQUARE,
        )
        assert on.tolist() == [True, True, False, False]


def test_overlapping_outers_union_semantics():
    """Two overlapping OUTER rings with hole flags: the union composition
    (reference GEOS union, geometryreader.hpp:256-274) keeps the overlap
    INSIDE; the flag-less parity path still cancels it (documented compat
    behavior for flat ring lists)."""
    import numpy as np

    from osm_history_splitter_spark.functions.geometry import (
        close_ring,
        points_in_rings,
    )
    from osm_history_splitter_spark.sources.poly import (
        parse_poly_multipolygon_text,
    )

    a = close_ring(np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]]))
    b = close_ring(np.array([[2.0, 2.0], [6.0, 2.0], [6.0, 6.0], [2.0, 6.0]]))
    lon = np.array([3.0, 1.0, 5.0, 10.0])
    lat = np.array([3.0, 1.0, 5.0, 10.0])
    # (3,3) is in BOTH outers: union keeps it IN ...
    got = points_in_rings(lon, lat, [a, b], holes=[False, False]).tolist()
    assert got == [True, True, True, False]
    # ... while the flag-less parity path cancels it (flat-list compat)
    assert points_in_rings(lon, lat, [a, b]).tolist() == [
        False, True, True, False,
    ]

    poly = "ov\nfirst\n0 0\n4 0\n4 4\n0 4\nEND\nsecond\n2 2\n6 2\n6 6\n2 6\nEND\nEND\n"
    rings, holes = parse_poly_multipolygon_text(poly)
    assert len(rings) == 2 and holes == [False, False]
    assert points_in_rings(lon, lat, rings, holes=holes).tolist() == [
        True, True, True, False,
    ]

    # VALID outer+hole file: union and parity agree (hole subtracted)
    hole = "hv\nouter\n0 0\n10 0\n10 10\n0 10\nEND\n!inner\n4 4\n6 4\n6 6\n4 6\nEND\nEND\n"
    hr, hh = parse_poly_multipolygon_text(hole)
    assert hh == [False, True]
    px = np.array([5.0, 1.0, 11.0])
    py = np.array([5.0, 1.0, 11.0])
    assert points_in_rings(px, py, hr, holes=hh).tolist() == [
        False, True, False,
    ]
    assert points_in_rings(px, py, hr).tolist() == [False, True, False]


def test_serbia_poly_overlap_region_is_inside():
    """The reference's own clipbounds/europe/serbia.poly has two
    overlapping outer rings (serbia proper + kosovo section). A point in
    the overlap must be IN under reference union semantics — previously
    pinned OUT under parity."""
    import numpy as np
    import pytest

    from osm_history_splitter_spark.functions.geometry import points_in_rings
    from osm_history_splitter_spark.sources.poly import parse_poly_multipolygon

    path = "/root/reference/clipbounds/europe/serbia.poly"
    try:
        rings, holes = parse_poly_multipolygon(path)
    except FileNotFoundError:
        pytest.skip("reference clipbounds not available")
    outers = [r for r, h in zip(rings, holes) if not h]
    assert len(outers) >= 2
    # sample a dense grid; points strictly interior to >= 2 outers are the
    # overlap region the reference's GEOS union keeps INSIDE
    minlon = min(r[:, 0].min() for r in outers)
    maxlon = max(r[:, 0].max() for r in outers)
    minlat = min(r[:, 1].min() for r in outers)
    maxlat = max(r[:, 1].max() for r in outers)
    gx, gy = np.meshgrid(
        np.linspace(minlon, maxlon, 120), np.linspace(minlat, maxlat, 120)
    )
    lon, lat = gx.ravel(), gy.ravel()
    depth = np.zeros(lon.shape[0], dtype=np.int64)
    for r in outers:
        depth += points_in_rings(lon, lat, [r]).astype(np.int64)
    in_hole = np.zeros(lon.shape[0], dtype=bool)
    for r, h in zip(rings, holes):
        if h:
            in_hole |= points_in_rings(lon, lat, [r])
    overlap = (depth == 2) & ~in_hole
    assert overlap.any(), "expected overlapping outers in serbia.poly"
    got = points_in_rings(lon[overlap], lat[overlap], rings, holes=holes)
    assert got.all(), "overlap region must be IN under union semantics"
    # and the old flat-parity composition disagrees there (the r04 VERDICT
    # divergence, now confined to the compat path)
    old = points_in_rings(lon[overlap], lat[overlap], rings)
    assert not old.any()


def test_zorder_interleave_matches_python_reference():
    """Morton key == bit-interleave computed the slow way, for random
    coords across the full globe."""
    import numpy as np

    from osm_history_splitter_spark.functions import grid

    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    res = 12
    w = grid.cell_width(res)
    got = grid.zorder_np(lon, lat, res)
    for j in range(500):
        ix = int(np.floor((lon[j] + 180.0) / w))
        iy = int(np.floor((lat[j] + 90.0) / w))
        z = 0
        for b in range(17):
            z |= ((ix >> b) & 1) << (2 * b)
            z |= ((iy >> b) & 1) << (2 * b + 1)
        assert got[j] == z


def test_zorder_locality_beats_row_order():
    """Sorting by the Z key must cluster geography: the mean great-ellipse
    distance between CONSECUTIVE points in z-order is far below the mean
    distance in id order (the property that makes file-level min/max
    pruning work)."""
    import numpy as np

    from osm_history_splitter_spark.functions import grid

    rng = np.random.default_rng(9)
    lon = rng.uniform(-180, 180, 4000)
    lat = rng.uniform(-90, 90, 4000)
    z = grid.zorder_np(lon, lat, 12)
    order = np.argsort(z, kind="stable")

    def mean_step(lo, la):
        return float(np.hypot(np.diff(lo), np.diff(la)).mean())

    assert mean_step(lon[order], lat[order]) < 0.2 * mean_step(lon, lat)


def test_zorder_res_guard_on_all_three_twins(spark):
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from osm_history_splitter_spark.functions import grid

    with pytest.raises(ValueError, match="res <= 15"):
        grid.zorder_np(np.array([0.0]), np.array([0.0]), 16)
    with pytest.raises(ValueError, match="res <= 15"):
        grid.zorder_sql("lon", "lat", 16)
    with pytest.raises(ValueError, match="res <= 15"):
        grid.zorder_expr(F.lit(0.0), F.lit(0.0), 16)


def test_zorder_write_layout_narrows_per_file_extents(spark, tmp_path):
    """The write-layout claim, proven at the FILE level: range-partition +
    sort by the Z key, and each parquet file's (lon, lat) bounding box
    covers a small fraction of the globe — so min/max file stats can
    prune a bbox scan. Row-order layout spreads every file across the
    whole globe."""
    import glob as globmod

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from osm_history_splitter_spark.functions import grid

    pts = spark.range(20000).select(
        F.col("id"),
        (((F.col("id") * 7919) % 36000) / 100.0 - 180.0).alias("lon"),
        (((F.col("id") * 104729) % 18000) / 100.0 - 90.0).alias("lat"),
    )
    z = grid.zorder_expr(F.col("lon"), F.col("lat"), 12).alias("z")

    def mean_file_area(path):
        areas = []
        for f in globmod.glob(f"{path}/*.parquet"):
            md = pq.read_metadata(f)
            lo = {"lon": 1e9, "lat": 1e9}
            hi = {"lon": -1e9, "lat": -1e9}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in lo and col.statistics is not None:
                        lo[name] = min(lo[name], col.statistics.min)
                        hi[name] = max(hi[name], col.statistics.max)
            areas.append(
                (hi["lon"] - lo["lon"]) * (hi["lat"] - lo["lat"])
            )
        return sum(areas) / len(areas)

    plain = str(tmp_path / "plain")
    pts.repartition(8).write.parquet(plain)
    zsorted = str(tmp_path / "zsorted")
    (
        pts.withColumn("zk", z)
        .repartitionByRange(8, "zk")
        .sortWithinPartitions("zk")
        .drop("zk")
        .write.parquet(zsorted)
    )
    globe = 360.0 * 180.0
    pa, za = mean_file_area(plain), mean_file_area(zsorted)
    assert pa > 0.5 * globe  # row order: every file spans the world
    # z-order: per-file extent is a small fraction of the globe (the
    # curve's bbox overhead keeps it above the ideal 1/8th)
    assert za < 0.25 * globe and za < 0.4 * pa
