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


# --- distributed XML ingestion (sources/ingest.py) ---------------------------


def _rows(df):
    return sorted(map(str, df.collect()))


def test_distributed_ingest_matches_fixture_loader(spark):
    """ingest_osm_xml (splittable text-records + Arrow-batched parse) must
    produce exactly the driver loader's tables on the reference's golden
    .osh (reference splitter.cpp:8-15 streams the same files)."""
    from osm_history_splitter_spark.sources.ingest import ingest_osm_xml

    p = f"{REF}/test/version-two-node-after.osh"
    got = ingest_osm_xml(spark, p)
    want = load_osm_dataframes(spark, p)
    for g, w, name in zip(got, want, ("nodes", "ways", "relations")):
        assert _rows(g) == _rows(w), name


def test_distributed_ingest_relations_and_self_closing(spark, tmp_path):
    """Relations with typed members, self-closing nodes, and '>' inside
    attribute values all survive the record-delimiter parse."""
    from osm_history_splitter_spark.sources.ingest import ingest_osm_xml

    p = tmp_path / "synth.osh"
    p.write_text(
        '<?xml version="1.0" encoding="UTF-8"?>\n<osm version="0.6">\n'
        '  <node id="1" lat="1.5" lon="2.5" version="1"/>\n'
        '  <node id="2" lat="3.5" lon="4.5" version="2" visible="false" '
        'timestamp="2012-01-01T10:00:00Z" user="a&gt;b>c" uid="7" changeset="9">\n'
        '    <tag k="x" v="val>with>gt"/>\n  </node>\n'
        '  <way id="10" version="1"><nd ref="1"/><nd ref="2"/>'
        '<tag k="hw" v="yes"/></way>\n'
        '  <relation id="20" version="3">'
        '<member type="node" ref="1" role="stop"/>'
        '<member type="way" ref="10" role=""/>'
        '<member type="relation" ref="21" role="sub"/>'
        "</relation>\n"
        "</osm>\n"
    )
    nodes, ways, rels = ingest_osm_xml(spark, str(p))
    n = {r["id"]: r for r in nodes.collect()}
    assert n[1]["version"] == 1 and n[1]["lat"] == 1.5 and n[1]["tags"] == {}
    assert n[2]["visible"] is False
    assert n[2]["user"] == "a>b>c"  # raw '>' in attribute value
    assert n[2]["tags"] == {"x": "val>with>gt"}
    w = ways.collect()[0]
    assert w["refs"] == [1, 2] and w["tags"] == {"hw": "yes"}
    r = rels.collect()[0]
    assert [(m["type"], m["ref"], m["role"]) for m in r["members"]] == [
        ("n", 1, "stop"), ("w", 10, ""), ("r", 21, "sub"),
    ]


def test_distributed_ingest_splits_within_one_file(spark, tmp_path):
    """A single large .osh must read as MULTIPLE partitions (the native XML
    source can't do this — the whole point of the custom reader) and still
    parse completely, elements straddling split boundaries included."""
    from osm_history_splitter_spark.sources.ingest import read_osm_elements

    p = tmp_path / "big.osh"
    with open(p, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n<osm version="0.6">\n')
        for i in range(20000):
            f.write(
                f'  <node id="{i}" lat="{(i % 180) - 90}.5" '
                f'lon="{(i % 360) - 180}.25" version="1" visible="true" '
                f'timestamp="2012-01-01T10:00:00Z" user="u" uid="1" '
                f'changeset="9">\n    <tag k="a" v="b{i}"/>\n  </node>\n'
            )
        f.write("</osm>\n")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(256 * 1024))
    try:
        df = read_osm_elements(spark, str(p), "node")
        assert df.rdd.getNumPartitions() > 4
        assert df.count() == 20000
        assert df.select("id").distinct().count() == 20000
        one = df.filter("id = 19999").collect()[0]
        assert one["tags"] == {"a": "b19999"} and one["lat"] == -71.5
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_ranged_ingest_matches_delimiter_reader(spark, tmp_path):
    """Byte-range reader == delimiter reader == fixture loader, with a
    split size tiny enough (128 B) that every range boundary lands inside
    elements — exercising overscan completion and start-byte ownership —
    and a multi-byte UTF-8 user name so byte/char offset confusion would
    misassign ownership."""
    from osm_history_splitter_spark.sources.ingest import (
        ingest_osm_xml,
        read_osm_elements_ranged,
    )

    # golden reference file, many tiny ranges
    p = f"{REF}/test/version-two-node-after.osh"
    for tag in ("node", "way", "relation"):
        ranged = read_osm_elements_ranged(spark, p, tag, split_bytes=128)
        delim = ingest_osm_xml(spark, p)[
            ("node", "way", "relation").index(tag)
        ]
        assert _rows(ranged) == _rows(delim), tag

    # synthetic file with multi-byte users + '>' in attributes
    q = tmp_path / "mb.osh"
    q.write_text(
        '<?xml version="1.0" encoding="UTF-8"?>\n<osm>\n'
        + "".join(
            f'  <node id="{i}" lat="{i}.5" lon="{i}.25" version="1" '
            f'user="üser_{i}_名前">'
            f'<tag k="note" v="a>b_{i}"/></node>\n'
            for i in range(40)
        )
        + '  <way id="99" version="1"><nd ref="1"/><nd ref="2"/></way>\n'
        + "</osm>\n",
        encoding="utf-8",
    )
    got = read_osm_elements_ranged(spark, str(q), "node", split_bytes=100)
    rows = {r["id"]: r for r in got.collect()}
    assert len(rows) == 40
    assert rows[7]["user"] == "üser_7_名前"
    assert rows[7]["tags"]["note"] == "a>b_7"
    ways = read_osm_elements_ranged(spark, str(q), "way", split_bytes=100)
    assert [r["refs"] for r in ways.collect()] == [[1, 2]]


def test_osm_nested_rings_are_outers_union():
    """go-no-cemetry.osm nests the cemetery ring inside the main ring.
    The reference's OSM geometry reader has NO role handling — every
    closed way is an OUTER polygon of one MultiPolygon
    (geometryreader.hpp:75-81,95-102), so a point inside the nested ring
    is INSIDE the extract (union), not cancelled as a hole."""
    import numpy as np

    from osm_history_splitter_spark.functions.geometry import points_in_rings
    from osm_history_splitter_spark.sources.config import parse_config

    cat = parse_config(f"{REF}/example.config")
    e = {x.name: x for x in cat}["go-no-cemetry"]
    assert e.holes == [False, False]
    inner = e.rings[1]
    cx = float(inner[:, 0].mean())
    cy = float(inner[:, 1].mean())
    got = points_in_rings(
        np.array([cx]), np.array([cy]), e.rings, holes=e.holes
    )
    assert got[0]  # union keeps the nested ring's interior IN
    # the flag-less parity path would cancel it (compat behavior)
    assert not points_in_rings(np.array([cx]), np.array([cy]), e.rings)[0]


def test_truncated_poly_trailing_ring_raises():
    """A .poly cut off before a ring's END must raise, not silently drop
    the trailing ring (smaller geometry = wrong membership)."""
    import pytest

    from osm_history_splitter_spark.sources.poly import (
        parse_poly_multipolygon_text,
    )

    with pytest.raises(ValueError, match="truncated"):
        parse_poly_multipolygon_text(
            "name\nr1\n0 0\n10 0\n10 10\nEND\nr2\n20 20\n30 20\n30 30\n"
        )


def test_element_snippet_attributeless_start_tag():
    """A record whose element starts with an immediate '>' (no
    attributes) must not inspect record[-1] via negative indexing."""
    from osm_history_splitter_spark.sources.ingest import _element_snippet

    # record as split on '<relation': starts directly with '>'
    rec = '><member type="node" ref="1" role=""/></relation>\n  trailing/'
    got = _element_snippet(rec, "relation")
    assert got is not None and got.startswith("<relation>")
    assert got.endswith("</relation>")
