"""Reference-format `.osm/.osh` XML sink (S8 parity): golden split of the
reference's own fixture, roundtrip through our own parser, compression
variants, escaping, and format-by-extension selection."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from osm_history_splitter_spark.operators.hardcut import hardcut
from osm_history_splitter_spark.operators.softcut import softcut
from osm_history_splitter_spark.plans.osm_writer import (
    parse_format,
    write_extracts_osm,
)
from osm_history_splitter_spark.sources.config import parse_config
from osm_history_splitter_spark.sources.osm_xml import (
    load_osm_dataframes,
    parse_osm_xml,
)

from .fixtures import golden_catalog

REF = "/root/reference"
FIXTURE = f"{REF}/test/version-two-node-after.osh"

#: element sets the fixture's own tag text encodes (FIXTURES.md §6)
SOFT_NODES = {(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2)}
SOFT_WAYS = {(10, 1), (10, 2)}


def test_parse_format_by_extension():
    assert parse_format("a.osh") == (True, None)
    assert parse_format("a.osm") == (False, None)
    assert parse_format("a.osh.gz") == (True, "gzip")
    assert parse_format("a.osm.bz2") == (False, "bzip2")
    assert parse_format("a.osh.pbf") == (True, "pbf")
    assert parse_format("a.osm.pbf") == (False, "pbf")
    with pytest.raises(ValueError):
        parse_format("a.parquet")
    with pytest.raises(ValueError, match="compressed"):
        parse_format("a.osh.pbf.gz")


def test_golden_softcut_emits_reference_fixture_expectations(spark, tmp_path):
    """Split the reference's own fixture through softcut and emit `.osh`:
    the emitted element set must match the expectations the fixture's tag
    text encodes, and every emitted row must carry the source's exact
    attribute values (verified by re-parsing with our fixture parser)."""
    nodes, ways, rels = load_osm_dataframes(spark, FIXTURE)
    cat = parse_config(f"{REF}/test/test.config")
    res = softcut(nodes, ways, rels, cat)
    paths = write_extracts_osm(
        res.nodes, res.ways, res.relations, cat, str(tmp_path)
    )
    assert set(paths) == {"test"}
    out_n, out_w, out_r = parse_osm_xml(paths["test"])
    assert {(r[0], r[1]) for r in out_n} == SOFT_NODES
    assert {(r[0], r[1]) for r in out_w} == SOFT_WAYS
    assert out_r == []
    # attribute fidelity: emitted rows == source rows for the kept set
    src_n, src_w, _ = parse_osm_xml(FIXTURE)
    assert sorted(out_n) == sorted(
        r for r in src_n if (r[0], r[1]) in SOFT_NODES
    )
    assert sorted(out_w) == sorted(
        r for r in src_w if (r[0], r[1]) in SOFT_WAYS
    )
    # O1/O2: nodes before ways, each in (id, version) order
    text = open(paths["test"]).read()
    assert text.index("<node") < text.index("<way")
    assert [(r[0], r[1]) for r in out_n] == sorted((r[0], r[1]) for r in out_n)


def test_golden_hardcut_drops_out_of_bbox_versions(spark, tmp_path):
    nodes, ways, rels = load_osm_dataframes(spark, FIXTURE)
    cat = parse_config(f"{REF}/test/test.config")
    res = hardcut(nodes, ways, rels, cat)
    paths = write_extracts_osm(
        res.nodes, res.ways, res.relations, cat, str(tmp_path)
    )
    out_n, out_w, _ = parse_osm_xml(paths["test"])
    assert {(r[0], r[1]) for r in out_n} == {(3, 1)}
    assert out_w == []


def test_gzip_fragments_concatenate_to_valid_file(spark, tmp_path):
    """Executor-compressed fragments + driver byte-concat must yield a
    valid multi-member gzip whose decompressed XML parses identically."""
    nodes, ways, rels = load_osm_dataframes(spark, FIXTURE)
    cat = parse_config(f"{REF}/test/test.config")
    res = softcut(nodes, ways, rels, cat)
    paths = write_extracts_osm(
        res.nodes, res.ways, res.relations, cat, str(tmp_path),
        filenames={"test": "test.osh.gz"},
    )
    raw = gzip.decompress(open(paths["test"], "rb").read())
    plain = tmp_path / "plain.osh"
    plain.write_bytes(raw)
    out_n, out_w, _ = parse_osm_xml(plain)
    assert {(r[0], r[1]) for r in out_n} == SOFT_NODES
    assert {(r[0], r[1]) for r in out_w} == SOFT_WAYS


def test_escaping_and_deleted_node_form(spark, tmp_path):
    """Tag values with XML metacharacters and newlines survive a
    roundtrip; deleted versions carry visible=false and no lat/lon."""
    import datetime as dt

    from osm_history_splitter_spark.model import (
        NODE_SCHEMA,
        RELATION_SCHEMA,
        WAY_SCHEMA,
    )

    ts = dt.datetime(2020, 1, 1)
    evil = 'a<b&c>"d\ne\tf'
    nodes = spark.createDataFrame(
        [
            (1, 1, True, ts, 7, 70, 'o"hara&sons', 0.5, 0.5, {"k<1": evil}),
            (1, 2, False, ts, 7, 71, "x", None, None, {}),
        ],
        schema=NODE_SCHEMA,
    ).withColumn("extract", F.lit("t"))
    ways = (
        spark.createDataFrame([], schema=WAY_SCHEMA)
        .withColumn("extract", F.lit("t"))
    )
    rels = (
        spark.createDataFrame([], schema=RELATION_SCHEMA)
        .withColumn("extract", F.lit("t"))
    )
    from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog

    cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    paths = write_extracts_osm(nodes, ways, rels, cat, str(tmp_path))
    text = open(paths["t"]).read()
    deleted = next(l for l in text.splitlines() if 'version="2"' in l)
    assert 'visible="false"' in deleted
    assert "lat=" not in deleted and "lon=" not in deleted
    out_n, _, _ = parse_osm_xml(paths["t"])
    live = next(r for r in out_n if r[1] == 1)
    assert live[6] == 'o"hara&sons'
    assert live[9] == {"k<1": evil}


def test_relation_members_and_way_refs_roundtrip(spark, tmp_path):
    import datetime as dt

    from osm_history_splitter_spark.model import (
        NODE_SCHEMA,
        RELATION_SCHEMA,
        WAY_SCHEMA,
    )
    from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog

    ts = dt.datetime(2020, 1, 1)
    nodes = (
        spark.createDataFrame([], schema=NODE_SCHEMA)
        .withColumn("extract", F.lit("t"))
    )
    ways = spark.createDataFrame(
        [(10, 1, True, ts, 1, 2, "u", [5, 6, 5], {"hw": "yes"})],
        schema=WAY_SCHEMA,
    ).withColumn("extract", F.lit("t"))
    rels = spark.createDataFrame(
        [(30, 2, True, ts, 1, 2, "u",
          [("n", 5, "stop"), ("w", 10, ""), ("r", 31, "sub&rel")], {})],
        schema=RELATION_SCHEMA,
    ).withColumn("extract", F.lit("t"))
    cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    paths = write_extracts_osm(
        nodes, ways, rels, cat, str(tmp_path), filenames={"t": "t.osh"}
    )
    _, out_w, out_r = parse_osm_xml(paths["t"])
    assert out_w[0][7] == [5, 6, 5]  # ref order and duplicates kept
    assert out_r[0][7] == [("n", 5, "stop"), ("w", 10, ""), ("r", 31, "sub&rel")]


def test_mixed_formats_one_run_reference_example_config(spark, tmp_path):
    """The reference's own ``example.config`` mixes ``.osh`` +
    ``.osh.pbf`` + ``.osh.gz`` + ``.osh.bz2`` dests in ONE run
    (``example.config:1-4``; format per dest via ``cut.hpp:73-74``). A
    single ``write_extracts_osm`` call must honor every per-extract
    format, and each output must decode to exactly the rows an all-.osh
    run emits for that extract."""
    import bz2

    from osm_history_splitter_spark.sources.config import parse_config_dests
    from osm_history_splitter_spark.sources.pbf import read_pbf

    cat = parse_config(f"{REF}/example.config")
    dests = parse_config_dests(f"{REF}/example.config")
    assert sorted(
        dests[n].rsplit(".osh", 1)[-1] for n in dests
    ) == ["", ".bz2", ".gz", ".pbf"]

    nodes, ways, rels = load_osm_dataframes(spark, FIXTURE)
    res = softcut(nodes, ways, rels, cat)
    mixed = write_extracts_osm(
        res.nodes, res.ways, res.relations, cat, str(tmp_path / "mixed"),
        filenames=dests,
    )
    plain = write_extracts_osm(
        res.nodes, res.ways, res.relations, cat, str(tmp_path / "plain"),
        filenames={n: f"{n}.osh" for n in dests},
    )
    assert set(mixed) == set(plain) == set(dests)

    def decode(path: str):
        if path.endswith(".pbf"):
            return read_pbf(path)
        if path.endswith(".gz"):
            raw = gzip.decompress(open(path, "rb").read())
        elif path.endswith(".bz2"):
            raw = bz2.decompress(open(path, "rb").read())
        else:
            return parse_osm_xml(path)
        p = tmp_path / "dec.osh"
        p.write_bytes(raw)
        return parse_osm_xml(p)

    for name in dests:
        got_n, got_w, got_r = decode(mixed[name])
        exp_n, exp_w, exp_r = parse_osm_xml(plain[name])
        assert got_n == exp_n, name
        assert got_w == exp_w, name
        assert got_r == exp_r, name


def test_config_dests_preserve_relative_dirs(spark, tmp_path):
    """A config dest like `o/test.osh` keeps its directory under the
    sink's output root (the reference cron driver mkdirs per dest
    dirname); absolute or parent-escaping dests fall back to the bare
    name."""
    from osm_history_splitter_spark.sources.config import parse_config_dests

    cfg = tmp_path / "h.config"
    cfg.write_text(
        "europe/germany.osh  BBOX 5,47,15,55\n"
        "/abs/evil.osh       BBOX 0,0,1,1\n"
        "../up/esc.osh       BBOX 0,0,1,1\n"
    )
    dests = parse_config_dests(cfg)
    assert dests == {
        "germany": "europe/germany.osh",
        "evil": "evil.osh",
        "esc": "esc.osh",
    }
    # end-to-end: the nested dest lands nested under the sink root
    import datetime as dt

    from osm_history_splitter_spark.model import (
        NODE_SCHEMA,
        RELATION_SCHEMA,
        WAY_SCHEMA,
    )
    from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog
    from osm_history_splitter_spark.sources.osm_xml import parse_osm_xml

    ts = dt.datetime(2020, 1, 1)
    nodes = spark.createDataFrame(
        [(1, 1, True, ts, 1, 1, "u", 50.0, 10.0, {})], schema=NODE_SCHEMA
    ).withColumn("extract", F.lit("germany"))
    ways = (
        spark.createDataFrame([], WAY_SCHEMA)
        .withColumn("extract", F.lit("germany"))
    )
    rels = (
        spark.createDataFrame([], RELATION_SCHEMA)
        .withColumn("extract", F.lit("germany"))
    )
    cat = ExtractCatalog([Extract.bbox("germany", 5.0, 47.0, 15.0, 55.0)])
    paths = write_extracts_osm(
        nodes, ways, rels, cat, str(tmp_path / "out"),
        filenames={"germany": dests["germany"]},
    )
    assert paths["germany"].endswith("/out/europe/germany.osh")
    out_n, _, _ = parse_osm_xml(paths["germany"])
    assert [(r[0], r[1]) for r in out_n] == [(1, 1)]


def test_xml_escape_fuzz_roundtrip(spark, tmp_path):
    """200 hostile tag/user strings (metacharacters, quotes, newlines,
    unicode, control-ish whitespace) through the Catalyst escape chain
    and back through the XML parser — byte-for-byte."""
    import datetime as dt
    import random

    from osm_history_splitter_spark.model import (
        NODE_SCHEMA,
        RELATION_SCHEMA,
        WAY_SCHEMA,
    )
    from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog

    rng = random.Random(42)
    alphabet = list("ab<>&\"'\n\r\t =;/\\") + ["&amp;", "&#10;", "é", "中", "𝄞"]

    def s():
        return "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))

    ts = dt.datetime(2020, 1, 1)
    rows = [
        (i, 1, True, ts, 1, 1, s(), 0.5, 0.5, {s() or "k": s()})
        for i in range(200)
    ]
    nodes = spark.createDataFrame(rows, NODE_SCHEMA).withColumn(
        "extract", F.lit("t")
    )
    ways = spark.createDataFrame([], WAY_SCHEMA).withColumn(
        "extract", F.lit("t")
    )
    rels = spark.createDataFrame([], RELATION_SCHEMA).withColumn(
        "extract", F.lit("t")
    )
    cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    paths = write_extracts_osm(nodes, ways, rels, cat, str(tmp_path))
    out_n, _, _ = parse_osm_xml(paths["t"])
    got = {r[0]: (r[6], r[9]) for r in out_n}
    for i, *_rest in rows:
        want_user, want_tags = rows[i][6], rows[i][9]
        assert got[i] == (want_user, want_tags), i


def _tiny_world(spark, extract: str, lon: float = 0.5, lat: float = 0.5):
    import datetime as dt

    from osm_history_splitter_spark.model import (
        NODE_SCHEMA,
        RELATION_SCHEMA,
        WAY_SCHEMA,
    )

    ts = dt.datetime(2020, 1, 1)
    nodes = spark.createDataFrame(
        [(1, 1, True, ts, 7, 70, "u", lat, lon, {})], schema=NODE_SCHEMA
    ).withColumn("extract", F.lit(extract))
    ways = spark.createDataFrame([], schema=WAY_SCHEMA).withColumn(
        "extract", F.lit(extract)
    )
    rels = spark.createDataFrame([], schema=RELATION_SCHEMA).withColumn(
        "extract", F.lit(extract)
    )
    return nodes, ways, rels


def test_slash_extract_name_not_lost_to_hive_escaping(spark, tmp_path):
    """An extract named 'europe/germany' is Hive-escaped on disk
    (extract=europe%2Fgermany): the fragment lookup must unquote, not
    format the raw name — the data was silently dropped before."""
    from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog

    name = "europe/germany"
    nodes, ways, rels = _tiny_world(spark, name)
    cat = ExtractCatalog([Extract.bbox(name, -1.0, -1.0, 1.0, 1.0)])
    paths = write_extracts_osm(nodes, ways, rels, cat, str(tmp_path))
    out_n, _, _ = parse_osm_xml(paths[name])
    assert [(r[0], r[1]) for r in out_n] == [(1, 1)]


def test_small_coordinates_render_fixed_decimal(spark, tmp_path):
    """|v| < 1e-3 must render as fixed 7-decimal (reference/osmium
    convention), never scientific notation ('5.0E-4')."""
    from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog

    nodes, ways, rels = _tiny_world(spark, "t", lon=0.0005, lat=-0.0000001)
    cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    paths = write_extracts_osm(nodes, ways, rels, cat, str(tmp_path))
    text = open(paths["t"]).read()
    assert 'lon="0.0005000"' in text
    assert 'lat="-0.0000001"' in text
    assert "E-" not in text and "e-0" not in text


def test_partial_filenames_dict_defaults_rest(spark, tmp_path):
    from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog

    nodes, ways, rels = _tiny_world(spark, "a")
    nb, wb, rb = _tiny_world(spark, "b")
    cat = ExtractCatalog([
        Extract.bbox("a", -1.0, -1.0, 1.0, 1.0),
        Extract.bbox("b", -1.0, -1.0, 1.0, 1.0),
    ])
    paths = write_extracts_osm(
        nodes.unionByName(nb), ways.unionByName(wb), rels.unionByName(rb),
        cat, str(tmp_path), filenames={"a": "custom.osm.gz"},
    )
    assert paths["a"].endswith("custom.osm.gz")
    assert paths["b"].endswith("b.osh")  # documented default


def test_pbf_sink_refuses_non_utc_session(spark, tmp_path):
    from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog
    from osm_history_splitter_spark.plans.pbf_writer import write_extracts_pbf

    nodes, ways, rels = _tiny_world(spark, "t")
    cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    spark.conf.set("spark.sql.session.timeZone", "Europe/Berlin")
    try:
        with pytest.raises(ValueError, match="timeZone=UTC"):
            write_extracts_pbf(nodes, ways, rels, cat, str(tmp_path))
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_pbf_default_name_tracks_history_flag(spark, tmp_path):
    from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog
    from osm_history_splitter_spark.plans.pbf_writer import write_extracts_pbf

    nodes, ways, rels = _tiny_world(spark, "t")
    cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    paths = write_extracts_pbf(
        nodes, ways, rels, cat, str(tmp_path), history=False
    )
    assert paths["t"].endswith("t.osm.pbf")


def test_fragment_concat_orders_parts_numerically(tmp_path):
    """part-100000 must splice AFTER part-99999 (Spark's %05d padding
    overflows past 99,999 tasks; lexicographic order would flip them)."""
    from osm_history_splitter_spark.plans.osm_writer import _concat_fragments

    frag = tmp_path / "frags"
    frag.mkdir()
    (frag / "part-99999-x.txt").write_bytes(b"FIRST\n")
    (frag / "part-100000-x.txt").write_bytes(b"SECOND\n")
    out = tmp_path / "out.osm"
    _concat_fragments(frag, out, "<osm>", None)
    body = out.read_text()
    assert body.index("FIRST") < body.index("SECOND")
