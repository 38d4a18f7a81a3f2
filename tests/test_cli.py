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
    assert manifest["published"] == {"nodes": 1, "ways": 1, "relations": 1}
    # the config dest kept its relative dir and .osh format
    path = manifest["osm_files"]["test"]
    assert path.endswith("/osm/o/test.osh")
    out_n, out_w, _ = parse_osm_xml(path)
    assert {(r[0], r[1]) for r in out_n} == {
        (1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2)
    }
    assert {(r[0], r[1]) for r in out_w} == {(10, 1), (10, 2)}
