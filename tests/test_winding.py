"""Winding-number fallback for antimeridian-crossing and pole-enclosing
polygons (north-star requirement: "ray-casting with winding-number fallback
on poles/antimeridian").

The planar even-odd test on normalized lon/lat is wrong for a ring whose
edge jumps across ±180 (it sees the wrong side of the globe) and cannot
represent a polar cap at all (no edge above the cap's max latitude for the
ray to cross). points_in_rings auto-detects those rings and routes to the
winding path; this file pins the fallback's semantics, its equivalence to
even-odd on normal rings, the cover soundness, and the end-to-end
assign_extracts behavior."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_history_splitter_spark.functions import grid
from osm_history_splitter_spark.functions.geometry import (
    points_in_rings,
    points_in_rings_winding,
    ring_winds_globe,
    ring_wraps_antimeridian,
    unwrap_ring,
)

# box straddling the antimeridian: lon in (170, 190) i.e. (170,180]∪[-180,-170)
AM_BOX = [
    np.array(
        [[170, -10], [-170, -10], [-170, 10], [170, 10], [170, -10]],
        dtype=float,
    )
]
# northern polar cap: everything above lat 80
N_CAP = [
    np.array(
        [[0, 80], [60, 80], [120, 80], [180, 80], [-120, 80], [-60, 80], [0, 80]],
        dtype=float,
    )
]
# southern polar cap: everything below lat -80 (vertices wind the other way)
S_CAP = [
    np.array(
        [[0, -80], [-60, -80], [-120, -80], [180, -80], [120, -80], [60, -80], [0, -80]],
        dtype=float,
    )
]

SQUARE = [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)]
SQUARE_WITH_HOLE = SQUARE + [
    np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], dtype=float)
]


def pip(lon, lat, rings):
    return points_in_rings(np.array([lon]), np.array([lat]), rings)[0]


class TestDetection:
    def test_wrap_detection(self):
        assert ring_wraps_antimeridian(AM_BOX[0])
        assert ring_wraps_antimeridian(N_CAP[0])
        assert not ring_wraps_antimeridian(SQUARE[0])

    def test_unwrap_continuity(self):
        r = unwrap_ring(AM_BOX[0])
        assert np.abs(np.diff(r[:, 0])).max() <= 180.0
        # a mere crossing comes back to its start; a cap winds ±360
        assert abs(ring_winds_globe(AM_BOX[0])) < 180.0
        assert abs(abs(ring_winds_globe(N_CAP[0])) - 360.0) < 1e-9
        assert abs(abs(ring_winds_globe(S_CAP[0])) - 360.0) < 1e-9


class TestAntimeridianBox:
    def test_inside_both_sides(self):
        assert pip(175, 0, AM_BOX)
        assert pip(-175, 0, AM_BOX)
        assert pip(179.9, 9.5, AM_BOX)
        assert pip(-179.9, -9.5, AM_BOX)

    def test_outside_middle_of_globe(self):
        # the naive even-odd on normalized coords claims exactly these IN
        assert not pip(0, 0, AM_BOX)
        assert not pip(165, 0, AM_BOX)
        assert not pip(-165, 0, AM_BOX)
        assert not pip(175, 15, AM_BOX)

    def test_boundary_is_out(self):
        assert not pip(170, 0, AM_BOX)  # west edge
        assert not pip(-170, 0, AM_BOX)  # east edge
        assert not pip(175, 10, AM_BOX)  # north edge (crosses ±180)
        assert not pip(170, -10, AM_BOX)  # vertex


class TestPolarCaps:
    def test_north_cap(self):
        assert pip(0, 85, N_CAP)
        assert pip(123, 89.9, N_CAP)
        assert pip(-45, 81, N_CAP)
        assert not pip(0, 75, N_CAP)
        assert not pip(180, -85, N_CAP)

    def test_south_cap(self):
        assert pip(0, -85, S_CAP)
        assert pip(-123, -89.9, S_CAP)
        assert not pip(0, -75, S_CAP)
        assert not pip(0, 85, S_CAP)

    def test_pole_point_is_interior(self):
        assert pip(0, 90, N_CAP)
        assert pip(77, 90, N_CAP)
        assert pip(0, -90, S_CAP)
        assert not pip(0, -90, N_CAP)

    def test_cap_boundary_is_out(self):
        assert not pip(60, 80, N_CAP)  # vertex
        assert not pip(30, 80, N_CAP)  # on the lat-80 edge


class TestEquivalenceOnNormalRings:
    """For rings that don't wrap, the winding path must agree exactly with
    the even-odd path (nonzero-winding == parity for simple rings; the XOR
    across rings keeps hole semantics identical)."""

    @settings(max_examples=200, deadline=None)
    @given(
        st.floats(-2, 6, allow_nan=False, allow_infinity=False),
        st.floats(-2, 6, allow_nan=False, allow_infinity=False),
    )
    def test_square_with_hole(self, x, y):
        lon, lat = np.array([x]), np.array([y])
        assert (
            points_in_rings_winding(lon, lat, SQUARE_WITH_HOLE)[0]
            == points_in_rings(lon, lat, SQUARE_WITH_HOLE)[0]
        )

    def test_random_star_polygon(self):
        rng = np.random.default_rng(3)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 17))
        rad = rng.uniform(1, 5, 17)
        ring = np.column_stack([rad * np.cos(ang), rad * np.sin(ang)])
        lon = rng.uniform(-6, 6, 2000)
        lat = rng.uniform(-6, 6, 2000)
        a = points_in_rings_winding(lon, lat, [ring])
        b = points_in_rings(lon, lat, [ring])
        assert (a == b).all()


class TestCoverWithWrappedRings:
    @pytest.mark.parametrize("rings", [AM_BOX, N_CAP, S_CAP])
    def test_cover_sound(self, rings):
        """Soundness on the whole globe: every inside point lands in a
        covered cell; every fully_inside cell holds only interior points."""
        res = 6
        cells, fully = grid.cover_rings(rings, res)
        cellset = dict(zip(cells.tolist(), fully.tolist()))
        rng = np.random.default_rng(11)
        lon = rng.uniform(-180, 180, 6000)
        lat = rng.uniform(-90, 90, 6000)
        inside = points_in_rings(lon, lat, rings)
        assert inside.any()  # the sample must exercise the inside
        pt_cells = grid.cell_ids_np(lon, lat, res)
        for i in range(lon.shape[0]):
            c = int(pt_cells[i])
            if inside[i]:
                assert c in cellset
            if cellset.get(c, False):
                assert inside[i]


def test_assign_extracts_antimeridian(spark):
    """End-to-end: an antimeridian .poly extract through the broadcast
    cover join + exact-PIP refine assigns exactly the true-side points."""
    from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog
    from osm_history_splitter_spark.operators.spatial_join import assign_extracts

    cat = ExtractCatalog(
        [
            Extract.poly("dateline", [AM_BOX[0]]),
            Extract.poly("ncap", [N_CAP[0]]),
        ]
    )
    pts = spark.createDataFrame(
        [
            (1, 175.0, 0.0),  # dateline, west side
            (2, -175.0, 0.0),  # dateline, east side
            (3, 0.0, 0.0),  # neither (middle of the globe)
            (4, 165.0, 0.0),  # just west of the box
            (5, 0.0, 85.0),  # north cap
            (6, 0.0, 75.0),  # below the cap
            (7, 170.0, 0.0),  # exactly on the box edge: OUT
            (8, 30.0, 80.0),  # exactly on the cap rim: OUT
        ],
        "id long, lon double, lat double",
    )
    got = {
        (r["id"], r["extract"])
        for r in assign_extracts(pts, cat).select("id", "extract").collect()
    }
    assert got == {(1, "dateline"), (2, "dateline"), (5, "ncap")}


def test_world_minus_antarctica_orientation():
    """A rim at lat -60 travelling EAST encloses the NORTH pole under the
    interior-on-the-left convention ('the world minus Antarctica'); a
    mean-rim-latitude heuristic would invert every membership. The same
    rim travelling WEST is the Antarctic cap."""
    import numpy as np

    from osm_history_splitter_spark.functions.geometry import (
        points_in_rings_winding,
    )

    east = np.array(
        [[0, -60], [60, -60], [120, -60], [180, -60],
         [-120, -60], [-60, -60], [0, -60]], dtype=float,
    )
    west = east[::-1].copy()
    lon = np.array([10.0, 10.0, 10.0, 0.0, 0.0])
    lat = np.array([40.0, -75.0, -60.0, 90.0, -90.0])
    got_e = points_in_rings_winding(lon, lat, [east])
    #            mid-north  deep-south  rim    Npole  Spole
    assert got_e.tolist() == [True, False, False, True, False]
    got_w = points_in_rings_winding(lon, lat, [west])
    assert got_w.tolist() == [False, True, False, False, True]


def test_planar_pole_edge_ring_not_misread_as_bare_rim():
    """An antarctica.poly-style ring with an EXPLICIT lat=-90 bottom edge
    is planar-encoded: the winding path must not unwrap away its 360°
    bottom jump and misread it as an eastward bare rim of the opposite
    cap (which inverted membership for the whole planet)."""
    import numpy as np

    from osm_history_splitter_spark.functions.geometry import points_in_rings

    ring = np.array(
        [[-180.0, -60.0], [0.0, -60.0], [180.0, -60.0],
         [180.0, -90.0], [-180.0, -90.0], [-180.0, -60.0]]
    )
    lon = np.array([0.0, 0.0, 0.0, 0.0])
    lat = np.array([0.0, 50.0, -75.0, -60.0])
    got = points_in_rings(lon, lat, [ring])
    #                equator  north  interior  on-rim(OUT)
    assert got.tolist() == [False, False, True, False]


def test_nonwrapping_ring_bit_identical_in_mixed_list():
    """A non-wrapping ring that routes to the winding path only because a
    SIBLING ring wraps must keep the planar path's exact semantics —
    including boundary ⇒ OUT on its own vertices (the fuzz-confirmed
    round-5 regression: re-accumulated unwrap coordinates broke the
    exact on-boundary match)."""
    import numpy as np

    from osm_history_splitter_spark.functions.geometry import points_in_rings

    rng = np.random.default_rng(7)
    wrapping = np.array(
        [[170.0, -10.0], [-170.0, -10.0], [-170.0, 10.0], [170.0, 10.0]]
    )
    for _ in range(200):
        # lon span < 180 ⇒ the ring provably does not wrap (the property
        # under test is about NON-wrapping siblings of a wrapping ring)
        pts = rng.uniform([-80.0, -80.0], [80.0, 80.0], size=(4, 2))
        ring = np.vstack([pts, pts[:1]])
        alone = points_in_rings(ring[:, 0], ring[:, 1], [ring])
        mixed = points_in_rings(ring[:, 0], ring[:, 1], [wrapping, ring])
        assert alone.tolist() == [False] * 5  # own vertices: boundary ⇒ OUT
        assert mixed.tolist() == alone.tolist()
        # interior/exterior sample points agree between the two routes
        probe = rng.uniform([-170.0, -80.0], [160.0, 80.0], size=(32, 2))
        a = points_in_rings(probe[:, 0], probe[:, 1], [ring])
        m = points_in_rings(probe[:, 0], probe[:, 1], [wrapping, ring])
        in_wrap = points_in_rings(probe[:, 0], probe[:, 1], [wrapping])
        assert (m == (a ^ in_wrap)).all()  # parity composition holds
