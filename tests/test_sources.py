"""Source parsers tested against the reference's own fixture files
(read-only inputs under /root/reference — data, not code)."""

from __future__ import annotations

import numpy as np
import pytest

from osm_history_splitter_spark.functions.geometry import points_in_rings
from osm_history_splitter_spark.sources.config import (
    parse_config,
    parse_config_text,
)
from osm_history_splitter_spark.sources.osm_xml import (
    load_osm_dataframes,
    parse_osm_xml,
    rings_from_osm_file,
)
from osm_history_splitter_spark.sources.poly import parse_poly, parse_poly_text

REF = "/root/reference"


class TestPoly:
    def test_europe_poly(self):
        rings = parse_poly(f"{REF}/clipbounds/europe.poly")
        assert len(rings) >= 1
        # Berlin inside, New York outside
        assert points_in_rings(np.array([13.4]), np.array([52.5]), rings)[0]
        assert not points_in_rings(np.array([-74.0]), np.array([40.7]), rings)[0]

    def test_all_reference_polys_parse(self):
        import glob

        for p in glob.glob(f"{REF}/clipbounds/**/*.poly", recursive=True):
            rings = parse_poly(p)
            assert all(r.shape[1] == 2 and r.shape[0] >= 4 for r in rings)

    def test_hole_ring(self):
        text = """test
outer
0 0
10 0
10 10
0 10
END
!hole
4 4
6 4
6 6
4 6
END
END
"""
        rings = parse_poly_text(text)
        assert len(rings) == 2
        assert points_in_rings(np.array([2.0]), np.array([2.0]), rings)[0]
        assert not points_in_rings(np.array([5.0]), np.array([5.0]), rings)[0]

    def test_auto_close(self):
        text = "t\nr\n0 0\n4 0\n4 4\n0 4\nEND\nEND\n"
        rings = parse_poly_text(text)
        assert np.array_equal(rings[0][0], rings[0][-1])


class TestOsmXml:
    def test_parse_golden_fixture(self):
        nodes, ways, rels = parse_osm_xml(f"{REF}/test/version-two-node-after.osh")
        assert len(nodes) == 7
        assert len(ways) == 3
        assert rels == []
        n1v1 = nodes[0]
        assert n1v1[0] == 1 and n1v1[1] == 1 and n1v1[7] == 10.0

    def test_rings_from_osm(self):
        rings = rings_from_osm_file(f"{REF}/clipbounds/aaa_test/go.osm")
        assert len(rings) >= 1

    def test_two_ring_osm_both_outers(self):
        # go-no-cemetry.osm has two closed ways; OSM kind = all outers
        rings = rings_from_osm_file(f"{REF}/clipbounds/aaa_test/go-no-cemetry.osm")
        assert len(rings) == 2


class TestConfig:
    def test_reference_test_config(self):
        cat = parse_config(f"{REF}/test/test.config")
        assert len(cat) == 1
        e = cat.extracts[0]
        assert e.kind == "BBOX"
        assert (e.minlon, e.minlat, e.maxlon, e.maxlat) == (-1.0, -1.0, 1.0, 1.0)
        assert e.name == "test"

    def test_reference_example_config(self):
        cat = parse_config(f"{REF}/example.config")
        kinds = [e.kind for e in cat.extracts]
        assert kinds == ["BBOX", "OSM", "OSM", "OSM"]
        names = [e.name for e in cat.extracts]
        assert names == ["go-bbox", "go", "go-and-gk", "go-no-cemetry"]

    def test_comments_and_blanks(self):
        cat = parse_config_text("# comment\n\no/x.osh BBOX 0,0,1,1\n")
        assert len(cat) == 1


def test_golden_fixture_end_to_end(spark):
    """Load the reference's actual .osh + .config files and reproduce the
    documented softcut/hardcut memberships — full file-to-result parity."""
    from osm_history_splitter_spark.operators.hardcut import hardcut
    from osm_history_splitter_spark.operators.softcut import softcut

    nodes, ways, rels = load_osm_dataframes(
        spark, f"{REF}/test/version-two-node-after.osh"
    )
    cat = parse_config(f"{REF}/test/test.config")
    s = softcut(nodes, ways, rels, cat, persist=False)
    got_nodes = sorted(
        (r["id"], r["version"]) for r in s.nodes.select("id", "version").collect()
    )
    assert got_nodes == [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2)]
    got_ways = sorted(
        (r["id"], r["version"]) for r in s.ways.select("id", "version").collect()
    )
    assert got_ways == [(10, 1), (10, 2)]

    h = hardcut(nodes, ways, rels, cat)
    assert sorted(
        (r["id"], r["version"]) for r in h.nodes.select("id", "version").collect()
    ) == [(3, 1)]
    assert h.ways.count() == 0
