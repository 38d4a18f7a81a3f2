"""Incremental re-split (CDC): membership-diff + data-diff pass-2 over
affected ids only, atomic merge+delete publish — must equal a
from-scratch split of the updated world."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from osm_history_splitter_spark.model import (
    NODE_SCHEMA,
    RELATION_SCHEMA,
    WAY_SCHEMA,
)
from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog
from osm_history_splitter_spark.plans.table import VersionedTable
from osm_history_splitter_spark.splitter import incremental_resplit, run_split

TS = dt.datetime(2020, 1, 1)
IN, OUT = 0.5, 5.0


def _nodes(spark, rows):
    return spark.createDataFrame(
        [(i, v, True, TS, 0, 0, "u", pos, pos, {}) for i, v, pos in rows],
        schema=NODE_SCHEMA,
    )


def _ways(spark, rows):
    return spark.createDataFrame(
        [(i, v, True, TS, 0, 0, "u", refs, {}) for i, v, refs in rows],
        schema=WAY_SCHEMA,
    )


def _world1(spark):
    nodes = _nodes(
        spark,
        [(i, 1, IN) for i in range(20)] + [(i, 1, OUT) for i in range(30, 35)],
    )
    ways = _ways(spark, [(100, 1, [0, 1])])
    rels = spark.createDataFrame([], RELATION_SCHEMA)
    return nodes, ways, rels


def _world2(spark):
    """Update: node 3 leaves the bbox (all versions), node 30 enters,
    node 5 gains v2, way 100 v2 now also references outside node 31
    (pulling it in as an extra node); everything else untouched."""
    rows = [
        (i, 1, IN) for i in range(20) if i != 3
    ] + [
        (3, 1, OUT),
        (5, 2, IN),
        (30, 1, IN),
    ] + [(i, 1, OUT) for i in range(31, 35)]
    nodes = _nodes(spark, rows)
    ways = _ways(spark, [(100, 1, [0, 1]), (100, 2, [0, 31])])
    rels = spark.createDataFrame([], RELATION_SCHEMA)
    return nodes, ways, rels


def _contents(t):
    df = t.read()
    cols = ["id", "version", "extract", "user"] + (
        ["lat"] if "lat" in df.columns else []
    )
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_incremental_equals_full_resplit(spark, tmp_path):
    cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    pub = str(tmp_path / "pub")
    ck1 = str(tmp_path / "ck1")
    n1, w1, r1 = _world1(spark)
    run_split(
        spark, n1, w1, r1, cat, str(tmp_path / "out1"),
        checkpoint_dir=ck1, publish_table=pub,
    )

    n2, w2, r2 = _world2(spark)
    report = incremental_resplit(
        spark, n2, w2, r2, cat, pub, ck1, str(tmp_path / "ck2")
    )

    # baseline: from-scratch split of world2 into a fresh table
    pub2 = str(tmp_path / "pub2")
    run_split(
        spark, n2, w2, r2, cat, str(tmp_path / "out2"),
        checkpoint_dir=str(tmp_path / "ck_full"), publish_table=pub2,
    )

    for entity in ("nodes", "ways", "relations"):
        inc = VersionedTable(spark, f"{pub}/{entity}")
        full = VersionedTable(spark, f"{pub2}/{entity}")
        if entity == "relations":
            # both empty: the incremental table may have no committed
            # rows for relations at all
            assert full.read().count() == 0
            continue
        assert _contents(inc) == _contents(full), entity

    # incrementality: only the changed ids were recomputed/upserted
    # (changed: 3 out, 5 data, 30 in, 31 extra-in, way 100 new version)
    assert report["nodes"]["affected_ids"] <= 5
    assert report["ways"]["affected_ids"] <= 1
    # time travel: the v1 world is still readable underneath
    t = VersionedTable(spark, f"{pub}/nodes")
    assert (3, 1) in {
        (r["id"], r["version"]) for r in t.read(version=1).collect()
    }
    assert (3, 1) not in {
        (r["id"], r["version"]) for r in t.read().collect()
    }


def test_incremental_noop_when_world_unchanged(spark, tmp_path):
    cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    pub = str(tmp_path / "pub")
    ck1 = str(tmp_path / "ck1")
    n1, w1, r1 = _world1(spark)
    run_split(
        spark, n1, w1, r1, cat, str(tmp_path / "out1"),
        checkpoint_dir=ck1, publish_table=pub,
    )
    before = _contents(VersionedTable(spark, f"{pub}/nodes"))
    report = incremental_resplit(
        spark, n1, w1, r1, cat, pub, ck1, str(tmp_path / "ck2")
    )
    assert report["nodes"]["affected_ids"] == 0
    assert report["nodes"]["upserted_rows"] == 0
    assert _contents(VersionedTable(spark, f"{pub}/nodes")) == before


def test_incremental_equals_full_on_random_updates(spark, tmp_path):
    """Randomized differential check: random world, random update batch
    (moves in/out, new versions, brand-new ids, way-ref edits) —
    incremental publish must equal a from-scratch split, seed by seed."""
    import random

    cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    for seed in (7, 23, 99):
        rng = random.Random(seed)
        base = tmp_path / f"s{seed}"

        def pos():
            return rng.choice([IN, OUT]) + rng.random() * 0.3

        n_rows = [(i, 1, pos()) for i in range(30)]
        w_rows = [
            (100 + j, 1, rng.sample(range(30), 3)) for j in range(4)
        ]
        n1, w1 = _nodes(spark, n_rows), _ways(spark, w_rows)
        r1 = spark.createDataFrame([], RELATION_SCHEMA)
        pub, ck1 = str(base / "pub"), str(base / "ck1")
        run_split(
            spark, n1, w1, r1, cat, str(base / "out1"),
            checkpoint_dir=ck1, publish_table=pub,
        )

        # mutate: some nodes move (new version at a new position), some
        # brand-new ids appear, one way gains a version with new refs
        n_rows2 = list(n_rows)
        for i in rng.sample(range(30), 5):
            n_rows2.append((i, 2, pos()))
        for i in (40, 41):
            n_rows2.append((i, 1, pos()))
        w_rows2 = w_rows + [(100, 2, rng.sample(range(42), 3))]
        n2, w2 = _nodes(spark, n_rows2), _ways(spark, w_rows2)
        incremental_resplit(
            spark, n2, w2, r1, cat, pub, ck1, str(base / "ck2")
        )

        pub2 = str(base / "pub2")
        run_split(
            spark, n2, w2, r1, cat, str(base / "out2"),
            checkpoint_dir=str(base / "ckf"), publish_table=pub2,
        )
        for entity in ("nodes", "ways"):
            inc = VersionedTable(spark, f"{pub}/{entity}")
            full = VersionedTable(spark, f"{pub2}/{entity}")
            assert _contents(inc) == _contents(full), (seed, entity)


def test_emit_osm_from_published_refreshes_only_affected(spark, tmp_path):
    """After an incremental re-split, the stale extract's file is
    rebuilt from the published table (stats-pruned per-extract read)
    and matches the updated world; time travel emits the OLD file."""
    from osm_history_splitter_spark.sources.osm_xml import parse_osm_xml
    from osm_history_splitter_spark.splitter import emit_osm_from_published

    cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    pub, ck1 = str(tmp_path / "pub"), str(tmp_path / "ck1")
    n1, w1, r1 = _world1(spark)
    run_split(
        spark, n1, w1, r1, cat, str(tmp_path / "out1"),
        checkpoint_dir=ck1, publish_table=pub,
    )
    n2, w2, r2 = _world2(spark)
    incremental_resplit(
        spark, n2, w2, r2, cat, pub, ck1, str(tmp_path / "ck2")
    )
    paths = emit_osm_from_published(
        spark, pub, cat, str(tmp_path / "osm"), extracts=["t"]
    )
    out_n, out_w, _ = parse_osm_xml(paths["t"])
    ids_n = {(r[0], r[1]) for r in out_n}
    assert (3, 1) not in ids_n  # left the bbox
    assert (30, 1) in ids_n and (5, 2) in ids_n and (31, 1) in ids_n
    assert {(r[0], r[1]) for r in out_w} == {(100, 1), (100, 2)}
    # time travel: version 1 emits the pre-update file
    old = emit_osm_from_published(
        spark, pub, cat, str(tmp_path / "osm_v1"), extracts=["t"], version=1
    )
    old_n, _, _ = parse_osm_xml(old["t"])
    old_ids = {(r[0], r[1]) for r in old_n}
    assert (3, 1) in old_ids and (30, 1) not in old_ids


def test_full_republish_deletes_vanished_rows(spark, tmp_path):
    """Repeated FULL split runs with publish_table (the CLI
    --publish-table path) must make the published snapshot equal the new
    split output exactly: a row that lost membership between dumps (node
    3 leaves the bbox in world2) has to VANISH from the table, not
    survive the merge."""
    cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    pub = str(tmp_path / "pub")
    n1, w1, r1 = _world1(spark)
    run_split(
        spark, n1, w1, r1, cat, str(tmp_path / "o1"),
        mode="softcut", publish_table=pub,
    )
    t = VersionedTable(spark, f"{pub}/nodes")
    assert (3, 1) in {(r["id"], r["version"]) for r in t.read().collect()}

    n2, w2, r2 = _world2(spark)
    run_split(
        spark, n2, w2, r2, cat, str(tmp_path / "o2"),
        mode="softcut", publish_table=pub,
    )
    got = {(r["id"], r["version"]) for r in t.read().collect()}
    # node 3 left the bbox entirely -> gone; node 30 entered; 5 gained v2
    assert (3, 1) not in got
    assert (30, 1) in got and (5, 2) in got
    # snapshot equals the fresh split output exactly
    fresh = spark.read.parquet(str(tmp_path / "o2" / "nodes"))
    expect = {(r["id"], r["version"]) for r in fresh.collect()}
    assert got == expect
    # time travel still shows the old snapshot
    old = {(r["id"], r["version"]) for r in t.read(version=1).collect()}
    assert (3, 1) in old


def test_signature_reuse_skips_unchanged_entities(spark, tmp_path):
    """Daily-diff shape: nodes gain new versions inside the same extract,
    ways/relations byte-identical. The world-signature gate must adopt
    the way/relation marker stages from the previous checkpoint (no
    recompute) and fully skip those entities' diff+commit — while the
    nodes entity still lands its delta and the final state equals a
    fresh split."""
    cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    pub = str(tmp_path / "pub")
    ck1 = str(tmp_path / "ck1")
    n1, w1, r1 = _world1(spark)
    run_split(
        spark, n1, w1, r1, cat, str(tmp_path / "o1"),
        checkpoint_dir=ck1, publish_table=pub,
    )
    # only node edits: id 5 gains v2 (same position), id 7 gains v2
    n2 = _nodes(
        spark,
        [(i, 1, IN) for i in range(20)]
        + [(5, 2, IN), (7, 2, IN)]
        + [(i, 1, OUT) for i in range(30, 35)],
    )
    report = incremental_resplit(
        spark, n2, w1, r1, cat, pub, ck1, str(tmp_path / "ck2")
    )
    assert report["ways"]["affected_ids"] == 0
    assert report["ways"]["upserted_rows"] == 0
    assert report["relations"]["affected_ids"] == 0
    assert report["nodes"]["affected_ids"] == 2
    # the way marker stage was ADOPTED: same marker metadata as tick 1
    import json
    from pathlib import Path

    m1 = json.loads((Path(ck1) / "way_members._DONE").read_text())
    m2 = json.loads(
        (Path(tmp_path / "ck2") / "way_members._DONE").read_text()
    )
    assert m1 == m2  # byte-equal marker => copied, not recomputed
    # final state equals a fresh split of world 2
    run_split(
        spark, n2, w1, r1, cat, str(tmp_path / "o2"),
        checkpoint_dir=str(tmp_path / "ckf"),
        publish_table=str(tmp_path / "pubf"),
    )
    for entity in ("nodes", "ways", "relations"):
        inc = VersionedTable(spark, f"{pub}/{entity}")
        full = VersionedTable(spark, str(tmp_path / "pubf" / entity))
        assert _contents(inc) == _contents(full), entity


def _rels(spark, rows):
    return spark.createDataFrame(
        [
            (i, v, True, TS, 0, 0, "u", [{"type": t, "ref": r, "role": ""} for t, r in members], {})
            for i, v, members in rows
        ],
        schema=RELATION_SCHEMA,
    )


def test_signature_gate_matrix_relations_only_change(spark, tmp_path):
    """Only the RELATION world changes: node and way marker stages must
    be adopted (signatures equal, no flips possible) and fully skipped,
    while relations recompute and land their delta — and the final state
    equals a fresh split."""
    cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    n1 = _nodes(spark, [(i, 1, IN) for i in range(10)])
    w1 = _ways(spark, [(100, 1, [0, 1])])
    r1 = _rels(spark, [(200, 1, [("n", 0), ("w", 100)])])
    pub, ck1 = str(tmp_path / "pub"), str(tmp_path / "ck1")
    run_split(
        spark, n1, w1, r1, cat, str(tmp_path / "o1"),
        checkpoint_dir=ck1, publish_table=pub,
    )
    r2 = _rels(
        spark,
        [(200, 1, [("n", 0), ("w", 100)]), (200, 2, [("n", 1)])],
    )
    rep = incremental_resplit(
        spark, n1, w1, r2, cat, pub, ck1, str(tmp_path / "ck2")
    )
    assert rep["nodes"]["affected_ids"] == 0
    assert rep["ways"]["affected_ids"] == 0
    assert rep["relations"]["affected_ids"] == 1
    got = {
        (r["id"], r["version"])
        for r in VersionedTable(spark, f"{pub}/relations").read().collect()
    }
    assert got == {(200, 1), (200, 2)}
    # differential: fresh split agrees on every entity
    run_split(
        spark, n1, w1, r2, cat, str(tmp_path / "o2"),
        checkpoint_dir=str(tmp_path / "ckf"),
        publish_table=str(tmp_path / "pubf"),
    )
    for entity in ("nodes", "ways", "relations"):
        inc = VersionedTable(spark, f"{pub}/{entity}")
        full = VersionedTable(spark, str(tmp_path / "pubf" / entity))
        assert _contents(inc) == _contents(full), entity


def test_signature_gate_matrix_ways_only_change(spark, tmp_path):
    """Only the WAY world changes (a new way version referencing an
    extra node): way markers must RECOMPUTE (sig differs) even though no
    node marker flipped — the extra-node set changes, so the nodes
    entity must also re-diff (it joins node∪extra markers) — and the
    final state equals a fresh split."""
    cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    n1 = _nodes(
        spark, [(i, 1, IN) for i in range(5)] + [(30, 1, OUT)]
    )
    w1 = _ways(spark, [(100, 1, [0, 1])])
    r1 = spark.createDataFrame([], RELATION_SCHEMA)
    pub, ck1 = str(tmp_path / "pub"), str(tmp_path / "ck1")
    run_split(
        spark, n1, w1, r1, cat, str(tmp_path / "o1"),
        checkpoint_dir=ck1, publish_table=pub,
    )
    # way 100 v2 now also references out-of-bbox node 30 -> extra node
    w2 = _ways(spark, [(100, 1, [0, 1]), (100, 2, [0, 30])])
    rep = incremental_resplit(
        spark, n1, w2, r1, cat, pub, ck1, str(tmp_path / "ck2")
    )
    assert rep["ways"]["affected_ids"] == 1
    assert rep["nodes"]["affected_ids"] == 1  # node 30 pulled in as extra
    got = {
        (r["id"], r["version"])
        for r in VersionedTable(spark, f"{pub}/nodes").read().collect()
    }
    assert (30, 1) in got
    run_split(
        spark, n1, w2, r1, cat, str(tmp_path / "o2"),
        checkpoint_dir=str(tmp_path / "ckf"),
        publish_table=str(tmp_path / "pubf"),
    )
    for entity in ("nodes", "ways"):
        inc = VersionedTable(spark, f"{pub}/{entity}")
        full = VersionedTable(spark, str(tmp_path / "pubf" / entity))
        assert _contents(inc) == _contents(full), entity


def test_catalog_change_invalidates_marker_reuse(spark, tmp_path):
    """Editing the extract config between ticks (same world!) must force
    a marker rebuild: membership can change for ids whose world rows are
    byte-identical, which the world signatures cannot see — the round-5
    review live-repro (stale rows published, affected_ids=0)."""
    import pytest

    pub = str(tmp_path / "pub")
    ck1 = str(tmp_path / "ck1")
    n1, w1, r1 = _world1(spark)
    cat1 = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    run_split(
        spark, n1, w1, r1, cat1, str(tmp_path / "out1"),
        checkpoint_dir=ck1, publish_table=pub,
    )
    assert _contents(VersionedTable(spark, f"{pub}/nodes"))

    # same world, extract moved to where no node is: everything vanishes
    cat2 = ExtractCatalog([Extract.bbox("t", 10.0, 10.0, 20.0, 20.0)])
    report = incremental_resplit(
        spark, n1, w1, r1, cat2, pub, ck1, str(tmp_path / "ck2")
    )
    assert report["nodes"]["affected_ids"] > 0
    assert _contents(VersionedTable(spark, f"{pub}/nodes")) == []

    # the explicit 'indexed' strategy refuses loudly instead
    with pytest.raises(ValueError, match="catalog changed"):
        incremental_resplit(
            spark, n1, w1, r1, cat1, pub, str(tmp_path / "ck2"),
            str(tmp_path / "ck3"), marker_strategy="indexed",
        )


def test_catalog_fingerprint_distinguishes_geometry():
    c1 = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    c2 = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 2.0)])
    c3 = ExtractCatalog([Extract.bbox("u", -1.0, -1.0, 1.0, 1.0)])
    ring = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    p1 = ExtractCatalog([Extract.poly("t", [ring])])
    p2 = ExtractCatalog([Extract.poly("t", [ring], holes=[True])])
    fps = {c.fingerprint() for c in (c1, c2, c3, p1, p2)}
    assert len(fps) == 5
    # deterministic and order-independent
    assert c1.fingerprint() == ExtractCatalog(
        [Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)]
    ).fingerprint()
    two = ExtractCatalog([
        Extract.bbox("a", 0.0, 0.0, 1.0, 1.0),
        Extract.bbox("b", 2.0, 2.0, 3.0, 3.0),
    ])
    swapped = ExtractCatalog([
        Extract.bbox("b", 2.0, 2.0, 3.0, 3.0),
        Extract.bbox("a", 0.0, 0.0, 1.0, 1.0),
    ])
    assert two.fingerprint() == swapped.fingerprint()
