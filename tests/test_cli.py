"""The spark-submit CLI entrypoint (splitter.main): end-to-end over a
parquet world dir with --emit-osm and --publish-table."""

from __future__ import annotations

import json
import sys


def test_cli_split_with_emit_osm_and_publish(spark, tmp_path, monkeypatch, capsys):
    from osm_history_splitter_spark.splitter import main
    from osm_history_splitter_spark.sources.osm_xml import (
        load_osm_dataframes,
        parse_osm_xml,
    )

    # stage the reference fixture as the CLI's parquet input layout
    nodes, ways, rels = load_osm_dataframes(
        spark, "/root/reference/test/version-two-node-after.osh"
    )
    world = tmp_path / "world"
    nodes.write.parquet(str(world / "nodes"))
    ways.write.parquet(str(world / "ways"))
    rels.write.parquet(str(world / "relations"))
    cfg = tmp_path / "test.config"
    cfg.write_text("o/test.osh  BBOX  -1,-1,1,1\n")

    out = tmp_path / "out"
    monkeypatch.setattr(
        sys, "argv",
        [
            "splitter",
            "--input", str(world),
            "--config", str(cfg),
            "--output", str(out),
            "--mode", "softcut",
            "--emit-osm",
            "--publish-table", str(tmp_path / "pub"),
        ],
    )
    # main() builds its own session via get_spark; the conftest session is
    # compatible (same JVM) — getOrCreate returns it
    main()
    manifest = json.loads(capsys.readouterr().out)
    assert manifest["nodes"]["rows"] == 6
    assert manifest["published"] == {
            "nodes": 1, "ways": 1, "relations": 1, "group": 1,
        }
    # the config dest kept its relative dir and .osh format
    path = manifest["osm_files"]["test"]
    assert path.endswith("/osm/o/test.osh")
    out_n, out_w, _ = parse_osm_xml(path)
    assert {(r[0], r[1]) for r in out_n} == {
        (1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2)
    }
    assert {(r[0], r[1]) for r in out_w} == {(10, 1), (10, 2)}


def test_cli_incremental_mode(spark, tmp_path, monkeypatch, capsys):
    """--incremental-from runs the CDC path end-to-end: tick 1 full
    split+publish, world update, tick 2 incremental — the published
    latest reflects the update with a small affected set."""
    import datetime as dt

    from pyspark.sql import functions as F

    from osm_history_splitter_spark.model import (
        NODE_SCHEMA,
        RELATION_SCHEMA,
        WAY_SCHEMA,
    )
    from osm_history_splitter_spark.plans.table import VersionedTable
    from osm_history_splitter_spark.splitter import main

    ts = dt.datetime(2020, 1, 1)

    def world(extra_version):
        rows = [(i, 1, True, ts, 0, 0, "u", 0.5, 0.5, {}) for i in range(10)]
        if extra_version:
            rows.append((0, 2, True, ts, 0, 0, "u", 0.6, 0.6, {}))
        n = spark.createDataFrame(rows, NODE_SCHEMA)
        w = spark.createDataFrame([], WAY_SCHEMA)
        r = spark.createDataFrame([], RELATION_SCHEMA)
        return n, w, r

    def stage(nwr, path):
        n, w, r = nwr
        n.write.mode("overwrite").parquet(f"{path}/nodes")
        w.write.mode("overwrite").parquet(f"{path}/ways")
        r.write.mode("overwrite").parquet(f"{path}/relations")

    cfg = tmp_path / "c.config"
    cfg.write_text("t.osh BBOX -1,-1,1,1\n")
    stage(world(False), str(tmp_path / "w1"))
    pub, ck1 = str(tmp_path / "pub"), str(tmp_path / "ck1")
    import json
    import sys

    monkeypatch.setattr(sys, "argv", [
        "s", "--input", str(tmp_path / "w1"), "--config", str(cfg),
        "--output", str(tmp_path / "o1"), "--checkpoint-dir", ck1,
        "--publish-table", pub,
    ])
    main()
    capsys.readouterr()

    stage(world(True), str(tmp_path / "w2"))
    monkeypatch.setattr(sys, "argv", [
        "s", "--input", str(tmp_path / "w2"), "--config", str(cfg),
        "--output", str(tmp_path / "o2"), "--incremental-from", ck1,
        "--publish-table", pub,
    ])
    main()
    report = json.loads(capsys.readouterr().out)
    assert report["nodes"]["affected_ids"] == 1  # only id 0 changed
    t = VersionedTable(spark, f"{pub}/nodes")
    assert t.read().count() == 11
    assert (0, 2) in {(r["id"], r["version"]) for r in t.read().collect()}


def test_cli_compact_cover_split_identical(
    spark, tmp_path, monkeypatch, capsys
):
    """--compact-cover must not change split output — only the broadcast
    index layout (the membership-equivalence is also property-tested in
    tests/test_compact_cover.py; this pins the CLI wiring)."""
    import json as _json

    from osm_history_splitter_spark.splitter import main
    from osm_history_splitter_spark.sources.osm_xml import load_osm_dataframes

    nodes, ways, rels = load_osm_dataframes(
        spark, "/root/reference/test/version-two-node-after.osh"
    )
    world = tmp_path / "world"
    nodes.write.parquet(str(world / "nodes"))
    ways.write.parquet(str(world / "ways"))
    rels.write.parquet(str(world / "relations"))
    cfg = tmp_path / "test.config"
    cfg.write_text("o/test.osh  BBOX  -1,-1,1,1\n")

    counts = {}
    for tag, extra in (("plain", []), ("compact", ["--compact-cover", "2"])):
        out = tmp_path / f"out_{tag}"
        monkeypatch.setattr(
            sys, "argv",
            ["splitter", "--input", str(world), "--config", str(cfg),
             "--output", str(out), "--mode", "softcut", *extra],
        )
        main()
        manifest = _json.loads(capsys.readouterr().out)
        counts[tag] = {
            k: manifest[k]["rows"] for k in ("nodes", "ways", "relations")
        }
        got = spark.read.parquet(str(out / "nodes")).select("id", "version")
        counts[tag]["node_rows"] = sorted(
            (r.id, r.version) for r in got.collect()
        )
    assert counts["plain"] == counts["compact"]


def test_pages_cli_warc_in_warc_out_with_publish(
    spark, tmp_path, monkeypatch, capsys
):
    """pages_cli: WARC crawl dir in → per-extract WARC dirs out +
    membership VersionedTable; membership equals the oracle-certified
    pages_split rows."""
    import json as _json

    from osm_history_splitter_spark.pages_cli import main as pages_main
    from osm_history_splitter_spark.oracle_queries import q_pages_split
    from osm_history_splitter_spark.plans.table import VersionedTable
    from osm_history_splitter_spark.sources.pages import synth_pages
    from osm_history_splitter_spark.sources.warc import write_warc

    crawl = tmp_path / "crawl"
    write_warc(
        synth_pages(spark, "/root/testdata/sf0.001"), str(crawl), partitions=2
    )
    cfg = tmp_path / "pages.config"
    cfg.write_text(
        "west  BBOX  -180,-90,0,90\n"
        "east  BBOX  0,-90,180,90\n"
    )
    out = tmp_path / "out"
    monkeypatch.setattr(
        sys, "argv",
        [
            "pages_cli",
            "--input", str(crawl),
            "--config", str(cfg),
            "--output", str(out),
            "--partitions", "2",
            "--publish-table", str(tmp_path / "members"),
        ],
    )
    pages_main()
    manifest = _json.loads(capsys.readouterr().out)
    assert manifest["published_version"] == 1
    t = VersionedTable(spark, str(tmp_path / "members"))
    got = {
        (r["url"], r["extract"]) for r in t.read().collect()
    }
    # oracle-certified membership over the same catalog shape
    from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog
    from osm_history_splitter_spark.functions.geotags import extract_geotags
    from osm_history_splitter_spark.operators.spatial_join import assign_extracts
    from pyspark.sql import functions as F

    pages = synth_pages(spark, "/root/testdata/sf0.001")
    pts = pages.select(
        "url", F.explode(extract_geotags(F.col("text"))).alias("g")
    ).select("url", F.col("g.lat").alias("lat"), F.col("g.lon").alias("lon"))
    cat = ExtractCatalog([
        Extract.bbox("west", -180.0, -90.0, 0.0, 90.0),
        Extract.bbox("east", 0.0, -90.0, 180.0, 90.0),
    ])
    want = {
        (r["url"], r["extract"])
        for r in assign_extracts(pts, cat).select("url", "extract")
        .distinct().collect()
    }
    assert {(u, e) for u, e in got} == want


def test_pages_cli_publish_empty_membership(spark, tmp_path, monkeypatch, capsys):
    """A config whose extracts match no page publishes a clean EMPTY
    version instead of crashing on commit(None) after the split work."""
    import json as _json

    from osm_history_splitter_spark.pages_cli import main as pages_main
    from osm_history_splitter_spark.plans.table import VersionedTable
    from osm_history_splitter_spark.sources.pages import synth_pages
    from osm_history_splitter_spark.sources.warc import write_warc

    crawl = tmp_path / "crawl"
    write_warc(
        synth_pages(spark, "/root/testdata/sf0.001").limit(40),
        str(crawl),
        partitions=1,
    )
    cfg = tmp_path / "nowhere.config"
    # 0.0001°-wide sliver in the Pacific: no synthetic geotag lands here
    cfg.write_text("void  BBOX  -139.99995,-0.00005,-139.9999,0\n")
    monkeypatch.setattr(
        sys, "argv",
        [
            "pages_cli",
            "--input", str(crawl),
            "--config", str(cfg),
            "--output", str(tmp_path / "out"),
            "--publish-table", str(tmp_path / "members"),
        ],
    )
    pages_main()
    manifest = _json.loads(capsys.readouterr().out)
    assert manifest["groups"] == {}
    assert manifest["published_version"] == 1
    t = VersionedTable(spark, str(tmp_path / "members"))
    assert t.read().count() == 0


def test_cli_module_guard_is_last_statement():
    """`python -m ...splitter` executes the module top-to-bottom: the
    __main__ guard must be the LAST statement, else the CLI calls main()
    before later defs (incremental_resplit, compact_published) bind —
    the round-5 NameError regression that in-process tests cannot see."""
    import ast
    import osm_history_splitter_spark.splitter as S

    tree = ast.parse(open(S.__file__).read())
    last = tree.body[-1]
    assert isinstance(last, ast.If)
    assert isinstance(last.test, ast.Compare)
    assert getattr(last.test.left, "id", None) == "__name__"


def test_cli_incremental_emit_osm_refreshes_files(
    spark, tmp_path, monkeypatch, capsys
):
    """--emit-osm on an --incremental-from tick regenerates the
    reference-format files from the published tables (was silently
    skipped)."""
    import datetime as dt
    import json

    from osm_history_splitter_spark.model import (
        NODE_SCHEMA,
        RELATION_SCHEMA,
        WAY_SCHEMA,
    )
    from osm_history_splitter_spark.sources.osm_xml import parse_osm_xml
    from osm_history_splitter_spark.splitter import main

    ts = dt.datetime(2020, 1, 1)

    def stage(extra_version, path):
        rows = [(i, 1, True, ts, 0, 0, "u", 0.5, 0.5, {}) for i in range(5)]
        if extra_version:
            rows.append((0, 2, True, ts, 0, 0, "u", 0.6, 0.6, {}))
        spark.createDataFrame(rows, NODE_SCHEMA).write.mode(
            "overwrite"
        ).parquet(f"{path}/nodes")
        spark.createDataFrame([], WAY_SCHEMA).write.mode(
            "overwrite"
        ).parquet(f"{path}/ways")
        spark.createDataFrame([], RELATION_SCHEMA).write.mode(
            "overwrite"
        ).parquet(f"{path}/relations")

    cfg = tmp_path / "c.config"
    cfg.write_text("t.osh BBOX -1,-1,1,1\n")
    stage(False, str(tmp_path / "w1"))
    pub, ck1 = str(tmp_path / "pub"), str(tmp_path / "ck1")
    monkeypatch.setattr(sys, "argv", [
        "s", "--input", str(tmp_path / "w1"), "--config", str(cfg),
        "--output", str(tmp_path / "o1"), "--checkpoint-dir", ck1,
        "--publish-table", pub,
    ])
    main()
    capsys.readouterr()

    stage(True, str(tmp_path / "w2"))
    monkeypatch.setattr(sys, "argv", [
        "s", "--input", str(tmp_path / "w2"), "--config", str(cfg),
        "--output", str(tmp_path / "o2"), "--incremental-from", ck1,
        "--publish-table", pub, "--emit-osm",
    ])
    main()
    report = json.loads(capsys.readouterr().out)
    assert "osm_files" in report
    path = report["osm_files"]["t"]
    out_n, _, _ = parse_osm_xml(path)
    assert {(r[0], r[1]) for r in out_n} == {(i, 1) for i in range(5)} | {
        (0, 2)
    }
