"""VersionedTable: snapshot isolation, time travel, merge upsert, crash
safety (orphan data files are invisible without a manifest)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_history_splitter_spark.plans.table import VersionedTable


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


def test_append_and_time_travel(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    v1 = t.commit(_df(spark, 0, 5, "a"))
    v2 = t.commit(_df(spark, 5, 8, "b"))
    assert (v1, v2) == (1, 2) and t.versions() == [1, 2]
    assert t.read().count() == 8
    assert t.read(version=1).count() == 5
    assert {r["tag"] for r in t.read(version=1).collect()} == {"a"}


def test_overwrite_snapshot(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5, "a"))
    t.commit(_df(spark, 0, 2, "b"), mode="overwrite")
    assert t.read().count() == 2
    assert t.read(version=1).count() == 5  # old snapshot intact


def test_merge_upserts_by_key(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 6, "old"))
    t.commit(_df(spark, 4, 9, "new"), mode="merge", merge_key="id")
    got = {r["id"]: r["tag"] for r in t.read().collect()}
    assert len(got) == 9
    assert all(got[i] == "old" for i in range(4))
    assert all(got[i] == "new" for i in range(4, 9))
    with pytest.raises(ValueError, match="merge_key"):
        t.commit(_df(spark, 0, 1, "x"), mode="merge")


def test_crashed_commit_is_invisible(spark, tmp_path):
    """Data files written without a manifest flip (crash between data
    write and manifest rename) must not appear to readers."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5, "a"))
    # simulate a crash: data lands for commit 2, manifest never flips
    _df(spark, 100, 200, "ghost").write.parquet(
        str(tmp_path / "t" / "data" / "c2")
    )
    assert t.versions() == [1]
    assert t.read().count() == 5
    # resume: the retry takes a FRESH commit dir (c3), version 2 commits
    # cleanly, and the ghost files stay unreferenced forever
    v = t.commit(_df(spark, 5, 6, "b"))
    assert v == 2
    assert t.read().count() == 6
    # path-COMPONENT check: part filenames contain random hex, so a
    # substring match on "c2" would flake when a legit c3 file draws it
    from pathlib import Path as _P

    assert all(_P(f).parent.name != "c2" for f in t._manifest(2)["files"])


def test_publish_split_output_with_composite_merge(spark, tmp_path):
    """Integration: publish a softcut node split to a versioned table,
    then re-split after a world update and MERGE by the split's natural
    composite key (id, version, extract) — the changed rows replace
    their predecessors, history stays time-travelable."""
    import datetime as dt

    from osm_history_splitter_spark.model import (
        NODE_SCHEMA,
        RELATION_SCHEMA,
        WAY_SCHEMA,
    )
    from osm_history_splitter_spark.operators.softcut import softcut
    from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog

    ts = dt.datetime(2020, 1, 1)

    def world(tagval):
        nodes = spark.createDataFrame(
            [(i, 1, True, ts, 0, 0, tagval, 0.5, 0.5, {}) for i in range(20)],
            schema=NODE_SCHEMA,
        )
        ways = spark.createDataFrame([], schema=WAY_SCHEMA)
        rels = spark.createDataFrame([], schema=RELATION_SCHEMA)
        return nodes, ways, rels

    cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    t = VersionedTable(spark, str(tmp_path / "published"))

    n1, w1, r1 = world("u1")
    t.commit(softcut(n1, w1, r1, cat).nodes)
    n2, w2, r2 = world("u2")
    t.commit(
        softcut(n2, w2, r2, cat).nodes,
        mode="merge",
        merge_key=["id", "version", "extract"],
    )
    latest = t.read()
    assert latest.count() == 20
    assert {r["user"] for r in latest.collect()} == {"u2"}
    assert {r["user"] for r in t.read(version=1).collect()} == {"u1"}


def test_concurrent_commit_loses_cleanly(spark, tmp_path):
    """Two writers racing for the same version: the second claim fails
    BEFORE writing anything; recover() releases a stale claim only while
    its manifest is missing."""
    import os

    from osm_history_splitter_spark.plans.table import ConcurrentCommitError

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 3, "a"))
    # writer A claims version 2 (simulated: claim file exists, no manifest)
    claim = tmp_path / "t" / "_manifests" / "v2.json.claim"
    os.close(os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
    with pytest.raises(ConcurrentCommitError):
        t.commit(_df(spark, 3, 4, "b"))
    assert t.versions() == [1]  # loser wrote nothing visible
    # A crashed: operator recovers the claim, retry commits
    assert t.recover(2) is True
    assert t.commit(_df(spark, 3, 4, "b")) == 2
    assert t.recover(2) is False  # committed version: nothing to recover
    assert t.read().count() == 4


def test_stale_snapshot_writer_cannot_overwrite_committed_version(
    spark, tmp_path, monkeypatch
):
    """Claims persist after a successful commit, so a writer that read
    versions() before the winner committed still fails at the claim —
    it can never rename over the committed manifest."""
    from osm_history_splitter_spark.plans.table import ConcurrentCommitError

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 3, "a"))
    t.commit(_df(spark, 3, 5, "b"))  # v2 committed; its claim persists
    assert (tmp_path / "t" / "_manifests" / "v2.json.claim").exists()
    # writer with a stale snapshot: sees only [1], targets v2 again
    monkeypatch.setattr(t, "versions", lambda: [1])
    with pytest.raises(ConcurrentCommitError):
        t.commit(_df(spark, 99, 100, "stale"))
    monkeypatch.undo()
    assert {r["tag"] for r in t.read().collect()} == {"a", "b"}


def test_failed_commit_attempt_releases_its_claim(spark, tmp_path):
    """A commit whose WRITE fails (transient Spark error) must release
    its version claim so the caller's retry is not wedged behind it —
    only a hard process crash leaves a claim for recover()."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 3, "a"))
    bad = spark.range(1).select(
        F.assert_true(F.col("id") > 10).alias("boom"), F.lit("x").alias("tag")
    )
    with pytest.raises(Exception):
        t.commit(bad)
    # claim for v2 released; an immediate retry commits cleanly as v2
    assert not (tmp_path / "t" / "_manifests" / "v2.json.claim").exists()
    assert t.commit(_df(spark, 3, 5, "b")) == 2
    assert t.read().count() == 5


def test_stats_pruned_read_skips_files_zorder_layout(spark, tmp_path):
    """Commit a z-order-clustered write with stats on the key: a narrow
    range read must skip most files (manifest min/max pruning) yet
    return exactly the rows the full-scan filter returns."""
    from osm_history_splitter_spark.functions.grid import zorder_expr

    n = 4000
    pts = spark.range(n).select(
        F.col("id"),
        ((F.col("id") % 360) - 180.0 + 0.5).alias("lon"),
        (((F.col("id") * 7) % 180) - 90.0 + 0.5).alias("lat"),
    )
    z = zorder_expr(F.col("lon"), F.col("lat"), 8).alias("z")
    clustered = (
        pts.select("id", "lon", "lat", z)
        .repartitionByRange(16, "z")
        .sortWithinPartitions("z")
    )
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(clustered, stats_cols=["z"])

    full = t.read()
    lo, hi = 0, 1 << 12  # a narrow z-range = a small spatial block
    kept, total = t.pruned_files(("z", lo, hi))
    assert total >= 8 and kept < total  # pruning actually skipped files
    got = sorted(r["id"] for r in t.read(between=("z", lo, hi)).collect())
    want = sorted(
        r["id"] for r in full.filter(F.col("z").between(lo, hi)).collect()
    )
    assert got == want and got  # non-vacuous


def test_stats_carry_over_across_append_commits(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.range(0, 100).repartition(1), stats_cols=["id"]
    )
    t.commit(
        spark.range(1000, 1100).repartition(1), stats_cols=["id"]
    )
    kept, total = t.pruned_files(("id", 0, 50))
    assert (kept, total) == (1, 2)  # v1's stats survived the v2 append
    assert t.read(between=("id", 0, 50)).count() == 51
    assert t.read(between=("id", 5000, 6000)).count() == 0


def test_vacuum_deletes_only_orphans(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5, "a"))
    # crashed attempt: data without a manifest
    _df(spark, 100, 200, "ghost").write.parquet(
        str(tmp_path / "t" / "data" / "c2")
    )
    t.commit(_df(spark, 5, 8, "b"))
    deleted = t.vacuum()
    assert deleted and all("/c2/" in d for d in deleted)
    assert not (tmp_path / "t" / "data" / "c2").exists()
    # live snapshots are untouched, including time travel
    assert t.read().count() == 8
    assert t.read(version=1).count() == 5
    assert t.vacuum() == []  # idempotent


def test_vacuum_refuses_while_commit_in_flight(spark, tmp_path):
    """A claim without a manifest marks a possibly-live writer: vacuum
    must refuse (its deletion target could be that writer's data)."""
    import os

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 3, "a"))
    claim = tmp_path / "t" / "_manifests" / "v2.json.claim"
    os.close(os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
    with pytest.raises(RuntimeError, match="in flight"):
        t.vacuum()
    t.recover(2)
    assert t.vacuum() == []  # resolved: safe again


def test_read_between_without_stats_is_conservative(spark, tmp_path):
    """A table committed WITHOUT stats_cols keeps every file on a range
    read (no false pruning) and still filters exactly."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 100).repartition(4))
    kept, total = t.pruned_files(("id", 0, 4))
    assert kept == total  # no stats: nothing skipped
    assert t.read(between=("id", 0, 4)).count() == 5


def test_delete_mode_removes_keys_snapshot_isolated(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 10, "a"))
    keys = spark.range(3, 6).select(F.col("id"))
    v = t.commit(keys, mode="delete", merge_key="id")
    assert v == 2
    assert sorted(r["id"] for r in t.read().collect()) == [
        0, 1, 2, 6, 7, 8, 9,
    ]
    assert t.read(version=1).count() == 10  # old snapshot intact
    with pytest.raises(ValueError, match="merge_key"):
        t.commit(keys, mode="delete")


def test_oracle_table_read_prunes_and_matches_raw(spark):
    """The driver-gate ``table_read`` query (oracle_queries.q_table_read)
    must do REAL file pruning: each of its 3 range-clustered commits has
    a low-id and a high-id file, so the bottom-third read must keep
    strictly fewer than all 6 — and the surviving rows must equal a plain
    filter over the raw parquet."""
    import hashlib
    import tempfile
    from pathlib import Path

    from pyspark.sql import functions as F

    from osm_history_splitter_spark.oracle_queries import q_table_read
    from osm_history_splitter_spark.plans.table import VersionedTable

    sf_dir = "/root/testdata/sf0.001"
    out = q_table_read(spark, sf_dir)  # builds the table as a side effect
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    mn, mx = ev.agg(F.min("event_id"), F.max("event_id")).first()
    lo, hi = mn, mn + (mx - mn) // 3
    expect = (
        ev.filter(F.col("event_id").between(lo, hi))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_cents"
            ),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, expect.collect())
    )
    key = hashlib.md5(f"{sf_dir}|{mn}|{mx}".encode()).hexdigest()[:12]
    root = Path(tempfile.gettempdir()) / f"osmhs_table_read_{key}"
    tbl = VersionedTable(spark, str(root))
    kept, total = tbl.pruned_files(("event_id", lo, hi))
    assert total == 6 and kept < total, (kept, total)


def _rows(t, **kw):
    return sorted((r["id"], r["tag"]) for r in t.read(**kw).collect())


def test_mor_merge_is_delta_only_and_reads_resolve(spark, tmp_path):
    """strategy='mor': a merge commit adds ONLY the upserted rows' files
    plus an equality-delete key file — no rewrite of previous files —
    and read() resolves to exactly the copy-on-write result."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 10, "a"))
    files_v1 = set(t._manifest(1)["files"])

    upd = _df(spark, 3, 6, "b")
    gone = spark.range(8, 10).select("id")
    v2 = t.commit(
        upd, mode="merge", merge_key="id", also_delete=gone, strategy="mor"
    )
    m = t._manifest(v2)
    # every v1 file is still in the snapshot untouched (no rewrite)
    assert files_v1 <= set(m["files"])
    assert m["deletes"] and all(d["seq"] == v2 for d in m["deletes"])
    assert _rows(t) == sorted(
        [(i, "a") for i in (0, 1, 2, 6, 7)] + [(i, "b") for i in (3, 4, 5)]
    )
    # time travel: v1 unaffected by the delete files
    assert _rows(t, version=1) == [(i, "a") for i in range(10)]


def test_mor_delete_then_reinsert_sequence_rule(spark, tmp_path):
    """A delete only applies to rows OLDER than it: re-inserting a key
    after a MOR delete must survive (the Iceberg sequence-number rule)."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5, "a"))
    t.commit(
        spark.range(2, 4).select("id"), mode="delete", merge_key="id",
        strategy="mor",
    )
    assert _rows(t) == [(0, "a"), (1, "a"), (4, "a")]
    # re-insert id 2 via append: newer than the delete -> visible
    t.commit(_df(spark, 2, 3, "c"))
    assert _rows(t) == [(0, "a"), (1, "a"), (2, "c"), (4, "a")]
    # and a second MOR merge deleting id 4 leaves the re-inserted row
    t.commit(
        _df(spark, 4, 5, "d"), mode="merge", merge_key="id", strategy="mor"
    )
    assert _rows(t) == [(0, "a"), (1, "a"), (2, "c"), (4, "d")]


def test_mor_compact_folds_state_and_keeps_history(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 6, "a"), stats_cols=["id"])
    t.commit(
        _df(spark, 1, 3, "b"), mode="merge", merge_key="id", strategy="mor"
    )
    before = _rows(t)
    v = t.compact(stats_cols=["id"])
    m = t._manifest(v)
    assert "deletes" not in m  # clean snapshot
    assert _rows(t) == before
    # MOR snapshot still time-travelable, delete files survive vacuum
    assert _rows(t, version=2) == before
    t.vacuum()
    assert _rows(t, version=2) == before


def test_mor_read_with_between_pruning(spark, tmp_path):
    """Stats pruning and equality deletes compose: a pruned range read
    over a MOR snapshot still applies the delete keys."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(
        _df(spark, 0, 100, "a").repartitionByRange(4, "id"),
        stats_cols=["id"],
    )
    t.commit(
        _df(spark, 10, 12, "b"), mode="merge", merge_key="id",
        strategy="mor",
    )
    got = sorted(
        (r["id"], r["tag"])
        for r in t.read(between=("id", 5, 15)).collect()
    )
    assert got == [
        (i, "b" if i in (10, 11) else "a") for i in range(5, 16)
    ]


def test_mor_read_applies_deletes_via_broadcast_anti_join(spark, tmp_path):
    """Scale shape of the MOR read: delete key sets are tiny relative to
    data files, so the planner must apply them as BROADCAST anti-joins
    (never a shuffle of the data side, never a CartesianProduct), and
    same-shape deletes must collapse to ONE anti-join per file group."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 1000, "a"))
    for lo in (10, 20, 30):
        t.commit(
            _df(spark, lo, lo + 5, "b"), mode="merge", merge_key="id",
            strategy="mor",
        )
    plan = t.read()._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # v1's group faces 3 same-shape deletes -> unioned into ONE anti-join;
    # groups: v1 (3 newer deletes->1 join), v2 (2->1), v3 (1->1), v4 (0)
    n_anti = plan.count("LeftAnti")
    assert n_anti == 3, plan
    assert t.read().filter("id = 12").collect()[0]["tag"] == "b"


def test_changes_feed_and_history(spark, tmp_path):
    """Change data feed: each commit's ADDED rows with version/type
    columns, O(delta) for MOR commits; deleted_keys returns that
    commit's equality-delete keys; history lists the commit log."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5, "a"))
    t.commit(_df(spark, 5, 8, "b"))  # append
    t.commit(
        _df(spark, 1, 3, "c"), mode="merge", merge_key="id", strategy="mor"
    )
    feed = t.changes(since=1)
    got = sorted(
        (r["id"], r["tag"], r["_change_version"]) for r in feed.collect()
    )
    assert got == [
        (1, "c", 3), (2, "c", 3), (5, "b", 2), (6, "b", 2), (7, "b", 2),
    ]
    assert set(feed.columns) >= {"id", "tag", "_change_version", "_change_type"}
    # delete half of the feed: the MOR commit recorded keys {1, 2}
    assert t.deleted_keys(2) is None
    dk = t.deleted_keys(3)
    assert sorted(r["id"] for r in dk.collect()) == [1, 2]
    # empty window
    assert t.changes(since=3).count() == 0
    h = t.history()
    assert [x["version"] for x in h] == [1, 2, 3]
    assert h[2]["mode"] == "merge" and h[2]["deletes"] == 1
    assert h[0]["parent"] is None and h[1]["parent"] == 1


def test_clustered_commit_prunes_files(spark, tmp_path):
    """cluster_by range-partitions + sorts the commit so per-file [min,
    max] slices are tight: a narrow read(between=...) skips most files,
    while the same data committed unclustered prunes nothing."""
    data = _df(spark, 0, 10_000, "a").repartition(8)  # scattered layout

    un = VersionedTable(spark, str(tmp_path / "un"))
    un.commit(data, stats_cols=["id"])
    kept_u, total_u = un.pruned_files(("id", 100, 200))
    assert kept_u == total_u == 8  # every file spans the whole id range

    cl = VersionedTable(spark, str(tmp_path / "cl"))
    cl.commit(data, cluster_by="id", target_files=8)  # stats default to id
    kept_c, total_c = cl.pruned_files(("id", 100, 200))
    assert total_c == 8 and kept_c <= 2
    assert cl.read(between=("id", 100, 200)).count() == 101
    assert cl.read().count() == 10_000


def test_compact_reclusters_mor_state(spark, tmp_path):
    """compact(cluster_by=...) is the OPTIMIZE ZORDER maintenance op:
    fold accumulated MOR deletes AND restore pruning in one commit."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 4_000, "a").repartition(4), stats_cols=["id"])
    t.commit(
        _df(spark, 1_000, 1_100, "b"),
        mode="merge", merge_key="id", strategy="mor",
    )
    before = sorted((r["id"], r["tag"]) for r in t.read().collect())
    v = t.compact(cluster_by="id", target_files=4)
    after = sorted((r["id"], r["tag"]) for r in t.read(version=v).collect())
    assert after == before
    kept, total = t.pruned_files(("id", 0, 500), version=v)
    assert total == 4 and kept == 1


def test_empty_initial_commit_reads_back_typed(spark, tmp_path):
    """An all-empty first commit writes ZERO parquet files; read() and
    changes() must still return a typed empty frame via the schema
    stamped in the manifest (was IndexError on files[0])."""
    from osm_history_splitter_spark.plans.table import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "t"))
    empty = spark.createDataFrame([], "id long, extract string")
    assert t.commit(empty) == 1
    got = t.read()
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["id", "extract"]
    feed = t.changes(0)
    assert feed.count() == 0
    assert "_change_version" in feed.columns
    # and a later non-empty commit over the empty base works
    t.commit(
        spark.createDataFrame([(1, "a")], "id long, extract string"),
        mode="merge", merge_key=["id", "extract"],
    )
    assert t.read().count() == 1


def test_changes_validates_versions(spark, tmp_path):
    from osm_history_splitter_spark.plans.table import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "t"))
    with pytest.raises(FileNotFoundError, match="no committed version"):
        t.changes(0)
    t.commit(spark.createDataFrame([(1,)], "id long"))
    with pytest.raises(FileNotFoundError, match="not in"):
        t.changes(0, until=7)


def test_vacuum_prunes_emptied_delete_dirs(spark, tmp_path):
    """vacuum removes orphaned _deletes_* SUBdirs so emptied commit dirs
    actually get rmdir'd (was: empty dirs accumulated forever)."""
    from osm_history_splitter_spark.plans.table import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([(1, "a")], "id long, v string"))
    # fake a crashed MOR commit: orphan data + an orphan delete-key dir
    from pathlib import Path

    cdir = Path(str(tmp_path / "t")) / "data" / "c99"
    (cdir / "_deletes_0").mkdir(parents=True)
    (cdir / "part-0.parquet").write_bytes(b"junk")
    (cdir / "_deletes_0" / "keys.parquet").write_bytes(b"junk")
    deleted = t.vacuum()
    assert len(deleted) == 2
    assert not cdir.exists()
