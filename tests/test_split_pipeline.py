"""End-to-end split pipeline: partitioned writes, lineage sidecars,
checkpoint/resume (T-level for SURVEY §3 + north_rule resumability)."""

from __future__ import annotations

import json

import pytest

from osm_history_splitter_spark.plans.checkpoint import StageStore
from osm_history_splitter_spark.plans.io import read_extract, write_extracts
from osm_history_splitter_spark.splitter import run_split

from .fixtures import golden_catalog, golden_nodes, golden_relations, golden_ways


def test_run_split_softcut(spark, tmp_path):
    out = str(tmp_path / "out")
    manifest = run_split(
        spark,
        golden_nodes(spark),
        golden_ways(spark),
        golden_relations(spark),
        golden_catalog(),
        out,
        mode="softcut",
    )
    assert manifest["nodes"]["rows"] == 6
    assert manifest["ways"]["rows"] == 2
    assert manifest["relations"]["rows"] == 0
    assert manifest["nodes"]["per_extract_rows"] == {"test": 6}
    # lineage sidecar exists and matches
    side = json.loads((tmp_path / "out/nodes/_lineage.json").read_text())
    assert side["rows"] == 6
    # partition pruning read path
    got = read_extract(spark, f"{out}/nodes", "test")
    assert got.count() == 6
    # resume markers for all four pass-1 stages + the derived node-id union
    assert set(manifest["checkpoints"]) == {
        "node_members", "way_members", "extra_nodes", "relation_members",
        "all_node_ids",
    }
    # markers are written BUCKETED by id (the shuffle-free pass-2 strategy)
    assert manifest["checkpoints"]["way_members"]["bucket_col"] == "id"


def test_run_split_resume_skips_done_stages(spark, tmp_path):
    out = str(tmp_path / "out")
    args = (
        golden_nodes(spark), golden_ways(spark), golden_relations(spark),
        golden_catalog(),
    )
    m1 = run_split(spark, *args, out, mode="softcut")
    assert m1["ways"]["rows"] == 2
    # corrupt a checkpoint's data but keep its marker: a resumed run must
    # REUSE it (proving it skips recompute) — way_members forced empty, so
    # a reused checkpoint yields 0 way rows while a recompute would yield 2
    from pathlib import Path

    ckpt = f"{out}/_checkpoints"
    store = StageStore(spark, ckpt, bucket_by=("id", 8))
    marker = Path(f"{ckpt}/way_members._DONE").read_text()
    empty = spark.createDataFrame([], store.load("way_members").schema)
    store.save("way_members", empty)
    Path(f"{ckpt}/way_members._DONE").write_text(marker)  # original marker back
    m2 = run_split(spark, *args, out, mode="softcut")
    assert m2["checkpoints"]["way_members"]["rows"] == 1  # original marker kept
    assert m2["ways"]["rows"] == 0  # corrupted checkpoint REUSED, not recomputed
    assert m2["nodes"]["rows"] == 6  # all_node_ids checkpoint reused too


def test_run_split_hardcut(spark, tmp_path):
    out = str(tmp_path / "out_h")
    manifest = run_split(
        spark,
        golden_nodes(spark),
        golden_ways(spark),
        golden_relations(spark),
        golden_catalog(),
        out,
        mode="hardcut",
    )
    assert manifest["nodes"]["rows"] == 1
    assert manifest["ways"]["rows"] == 0


def test_write_extracts_salted_layout(spark, tmp_path):
    df = spark.range(1000).selectExpr(
        "id", "CASE WHEN id % 10 = 0 THEN 'cold' ELSE 'hot' END AS extract"
    )
    m = write_extracts(df, str(tmp_path / "w"), "t", salt_buckets=4)
    assert m["rows"] == 1000
    assert m["per_extract_rows"] == {"hot": 900, "cold": 100}
    import glob

    # hot extract written by multiple salted tasks -> multiple files
    files = glob.glob(str(tmp_path / "w/extract=hot/*.parquet"))
    assert len(files) > 1


def test_lineage_keys_unescaped_for_hierarchical_names(spark, tmp_path):
    """Hierarchical extract names contain '/', which the partition layout
    URL-escapes ('extract=europe%2Fgermany'); partition_files keys must be
    the UNESCAPED name, consistent with per_extract_rows."""
    df = spark.range(100).selectExpr("id", "'europe/germany' AS extract")
    m = write_extracts(df, str(tmp_path / "esc"), "t", salt_buckets=2)
    assert list(m["per_extract_rows"]) == ["europe/germany"]
    assert list(m["partition_files"]) == ["europe/germany"]
    assert m["partition_files"]["europe/germany"]  # files listed


def test_write_extracts_all_map_columns_has_salt_fallback(spark, tmp_path):
    """A frame whose only non-partition columns are MapType can't feed
    xxhash64 — the salt must fall back instead of erroring."""
    df = spark.sql(
        "SELECT map('k', CAST(id AS STRING)) AS tags, 'x' AS extract "
        "FROM range(50)"
    )
    m = write_extracts(df, str(tmp_path / "maps"), "t", salt_buckets=2)
    assert m["rows"] == 50


def test_write_extracts_observed_counts_and_bbox(spark, tmp_path):
    """With a catalog: per-extract counts ride the write job (observe) and
    the manifest carries each extract's bbox (reference cut.hpp:99-106)."""
    from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog

    cat = ExtractCatalog(
        [Extract.bbox("hot", -10.0, -10.0, 10.0, 10.0),
         Extract.bbox("cold", 20.0, 20.0, 30.0, 30.0)]
    )
    df = spark.range(1000).selectExpr(
        "id", "CASE WHEN id % 10 = 0 THEN 'cold' ELSE 'hot' END AS extract"
    )
    m = write_extracts(df, str(tmp_path / "w2"), "t", salt_buckets=4, catalog=cat)
    assert m["per_extract_rows"] == {"hot": 900, "cold": 100}
    assert m["extract_bbox"]["hot"] == [-10.0, -10.0, 10.0, 10.0]
    assert m["extract_bbox"]["cold"] == [20.0, 20.0, 30.0, 30.0]


def test_write_extracts_salt_is_deterministic(spark, tmp_path):
    """Two writes of the same data land identical per-partition contents —
    the salt is a content hash, not rand() (shuffle-retry safety)."""
    from osm_history_splitter_spark.plans.io import _salt_col
    from pyspark.sql import functions as F

    df = spark.range(500).selectExpr("id", "'e' AS extract")
    s1 = [r[0] for r in df.select(_salt_col(df, 8)).collect()]
    s2 = [r[0] for r in df.select(_salt_col(df, 8)).collect()]
    assert s1 == s2
    assert len(set(s1)) > 1  # actually spreads


def test_history_compat_raises(spark, tmp_path):
    from osm_history_splitter_spark.model import validate_history_compat
    from osm_history_splitter_spark.splitter import run_split
    from .fixtures import golden_catalog, golden_relations, golden_ways

    import pytest as _pytest

    flat = spark.range(3).selectExpr(
        "id", "0.0 AS lon", "0.0 AS lat"
    )  # no version/visible -> not history-shaped
    with _pytest.raises(ValueError, match="history"):
        validate_history_compat(flat, "nodes", expect_history=True)
    with _pytest.raises(ValueError, match="history"):
        run_split(
            spark, flat, golden_ways(spark), golden_relations(spark),
            golden_catalog(), str(tmp_path / "x"),
        )
    # and the inverse direction
    hist = spark.range(3).selectExpr(
        "id", "1 AS version", "true AS visible"
    )
    with _pytest.raises(ValueError, match="versions"):
        validate_history_compat(hist, "nodes", expect_history=False)


def test_write_extracts_large_catalog_falls_back(spark, tmp_path):
    """>256 extracts: observe-per-extract would bloat codegen; counts come
    from footers instead, bboxes still recorded."""
    from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog

    cat = ExtractCatalog(
        [Extract.bbox(f"e{i}", 0.0, 0.0, 1.0, 1.0) for i in range(300)]
    )
    df = spark.range(600).selectExpr(
        "id", "concat('e', cast(id % 300 as string)) AS extract"
    )
    m = write_extracts(df, str(tmp_path / "big"), "t", salt_buckets=2, catalog=cat)
    assert m["rows"] == 600
    assert m["per_extract_rows"]["e0"] == 2
    assert len(m["per_extract_rows"]) == 300
    assert m["extract_bbox"]["e7"] == [0.0, 0.0, 1.0, 1.0]


def test_run_split_emits_reference_format_xml(spark, tmp_path):
    """--emit-osm analog: run_split(osm_filenames=...) writes one
    reference-format XML file per extract alongside the parquet output,
    and the emitted element set matches the parquet rows."""
    from osm_history_splitter_spark.sources.osm_xml import parse_osm_xml

    out = str(tmp_path / "out")
    manifest = run_split(
        spark,
        golden_nodes(spark),
        golden_ways(spark),
        golden_relations(spark),
        golden_catalog(),
        out,
        mode="softcut",
        osm_filenames={"test": "test.osh"},
    )
    path = manifest["osm_files"]["test"]
    assert path.endswith("/osm/test.osh")
    out_n, out_w, out_r = parse_osm_xml(path)
    assert {(r[0], r[1]) for r in out_n} == {
        (1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2)
    }
    assert {(r[0], r[1]) for r in out_w} == {(10, 1), (10, 2)}
    assert out_r == []


def test_run_split_publish_table_time_travels(spark, tmp_path):
    """--publish-table: the first split commits v1; a re-split after a
    world update MERGEs by (id, version, extract) — latest read shows the
    update, version 1 still reads the original."""
    from pyspark.sql import functions as F

    from osm_history_splitter_spark.plans.table import VersionedTable

    pub = str(tmp_path / "published")

    def split(world_nodes, out):
        return run_split(
            spark, world_nodes, golden_ways(spark), golden_relations(spark),
            golden_catalog(), str(tmp_path / out), mode="softcut",
            publish_table=pub,
        )

    m1 = split(golden_nodes(spark), "out1")
    assert m1["published"] == {
        "nodes": 1, "ways": 1, "relations": 1, "group": 1,
    }
    # world update: same ids/versions, changed user attribution
    updated = golden_nodes(spark).withColumn("user", F.lit("someone-else"))
    m2 = split(updated, "out2")
    assert m2["published"]["nodes"] == 2
    t = VersionedTable(spark, f"{pub}/nodes")
    assert {r["user"] for r in t.read().collect()} == {"someone-else"}
    assert {r["user"] for r in t.read(version=1).collect()} == {"me"}
    assert t.read().count() == t.read(version=1).count() == 6


def test_published_table_prunes_per_extract(spark, tmp_path):
    """--publish-table output is (extract, id)-clustered with manifest
    stats: a single-extract read must skip files of the other extract
    and return exactly that extract's rows."""
    import datetime as dt

    from pyspark.sql import functions as F

    from osm_history_splitter_spark.model import (
        NODE_SCHEMA,
        RELATION_SCHEMA,
        WAY_SCHEMA,
    )
    from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog
    from osm_history_splitter_spark.plans.table import VersionedTable

    ts = dt.datetime(2020, 1, 1)
    nodes = spark.createDataFrame(
        [
            (i, 1, True, ts, 0, 0, "u",
             0.5 if i % 2 == 0 else 5.5, 0.5 if i % 2 == 0 else 5.5, {})
            for i in range(400)
        ],
        schema=NODE_SCHEMA,
    )
    ways = spark.createDataFrame([], WAY_SCHEMA)
    rels = spark.createDataFrame([], RELATION_SCHEMA)
    cat = ExtractCatalog(
        [
            Extract.bbox("inner", 0.0, 0.0, 1.0, 1.0),
            Extract.bbox("outer", 5.0, 5.0, 6.0, 6.0),
        ]
    )
    pub = str(tmp_path / "pub")
    run_split(
        spark, nodes, ways, rels, cat, str(tmp_path / "out"),
        mode="softcut", publish_table=pub,
    )
    t = VersionedTable(spark, f"{pub}/nodes")
    kept, total = t.pruned_files(("extract", "inner", "inner"))
    assert kept < total  # stats actually skip the other extract's files
    got = t.read(between=("extract", "inner", "inner"))
    assert got.count() == 200
    assert {r["extract"] for r in got.select("extract").distinct().collect()} == {
        "inner"
    }


def test_run_split_refuses_stale_checkpoint(spark, tmp_path):
    """Resuming a checkpoint built from a DIFFERENT world or catalog must
    raise instead of silently joining this world against stale markers
    (the round-5 resume-poisoning finding)."""
    import datetime as dt

    import pytest

    from osm_history_splitter_spark.model import (
        NODE_SCHEMA,
        RELATION_SCHEMA,
        WAY_SCHEMA,
    )
    from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog
    from osm_history_splitter_spark.splitter import run_split

    ts = dt.datetime(2020, 1, 1)

    def world(n):
        return (
            spark.createDataFrame(
                [(i, 1, True, ts, 0, 0, "u", 0.5, 0.5, {}) for i in range(n)],
                NODE_SCHEMA,
            ),
            spark.createDataFrame([], WAY_SCHEMA),
            spark.createDataFrame([], RELATION_SCHEMA),
        )

    cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    ck = str(tmp_path / "ck")
    n1, w1, r1 = world(5)
    run_split(spark, n1, w1, r1, cat, str(tmp_path / "o1"), checkpoint_dir=ck)

    # same checkpoint, same world: resume is fine (idempotent)
    run_split(spark, n1, w1, r1, cat, str(tmp_path / "o1b"), checkpoint_dir=ck)

    # same checkpoint, DIFFERENT world: refuse
    n2, w2, r2 = world(7)
    with pytest.raises(ValueError, match="different world or extract catalog"):
        run_split(
            spark, n2, w2, r2, cat, str(tmp_path / "o2"), checkpoint_dir=ck
        )

    # same world, DIFFERENT catalog: refuse too
    cat2 = ExtractCatalog([Extract.bbox("t", 0.0, 0.0, 2.0, 2.0)])
    with pytest.raises(ValueError, match="different world or extract catalog"):
        run_split(
            spark, n1, w1, r1, cat2, str(tmp_path / "o3"), checkpoint_dir=ck
        )


def test_stagestore_sanitized_name_collision(spark, tmp_path):
    """'markers-a' and 'markers.a' sanitize to the same catalog table
    name; the digest suffix must keep their bucketed tables apart."""
    from osm_history_splitter_spark.plans.checkpoint import StageStore

    store = StageStore(spark, str(tmp_path / "ck"), bucket_by=("id", 4))
    a = spark.createDataFrame([(1,)], "id long")
    b = spark.createDataFrame([(2,)], "id long")
    store.get_or_compute("markers-a", lambda: a)
    store.get_or_compute("markers.a", lambda: b)
    assert [r["id"] for r in store.load("markers-a").collect()] == [1]
    assert [r["id"] for r in store.load("markers.a").collect()] == [2]
