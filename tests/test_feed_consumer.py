"""follow_into (streaming/feed_consumer.py): a derived VersionedTable
maintained from the source table's change feed, exactly-once via txn
stamps, restart-safe from the checkpoint."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_history_splitter_spark.plans.table import VersionedTable
from osm_history_splitter_spark.streaming.feed_consumer import follow_into


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


def _derive(batch):
    return batch.select(
        "id", F.length("text").alias("chars"), "_change_version"
    )


def _expected(src):
    return sorted(
        (r["id"], len(r["text"])) for r in src.read().collect()
    )


def _got(tgt):
    return sorted((r["id"], r["chars"]) for r in tgt.read().collect())


def test_follow_into_tracks_source_commits(spark, tmp_path):
    src = VersionedTable(spark, str(tmp_path / "src"))
    tgt = VersionedTable(spark, str(tmp_path / "tgt"))
    src.commit(_docs(spark, [(1, "aa"), (2, "bbb"), (3, "c")]))
    q = follow_into(
        src, tgt, _derive, merge_key="id", checkpoint_dir=str(tmp_path / "ck")
    )
    try:
        q.processAllAvailable()
        assert _got(tgt) == _expected(src)
        # an upsert in the source flows through as an upsert in the target
        src.commit(
            _docs(spark, [(2, "bbbbbb"), (4, "dddd")]),
            mode="merge", merge_key="id", strategy="mor",
        )
        q.processAllAvailable()
        assert _got(tgt) == _expected(src) == [(1, 2), (2, 6), (3, 1), (4, 4)]
        # the derived rows carry the source commit that produced them
        vers = {r["id"]: r["_change_version"] for r in tgt.read().collect()}
        assert vers == {1: 1, 3: 1, 2: 2, 4: 2}
    finally:
        q.stop()


def test_checkpoint_restart_commits_each_batch_once(spark, tmp_path):
    src = VersionedTable(spark, str(tmp_path / "src"))
    tgt = VersionedTable(spark, str(tmp_path / "tgt"))
    ck = str(tmp_path / "ck")
    src.commit(_docs(spark, [(1, "aa"), (2, "bbb")]))

    def _run():
        q = follow_into(src, tgt, _derive, merge_key="id", checkpoint_dir=ck)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _run()
    n1 = len(tgt.versions())
    _run()  # nothing new: no extra target commit
    assert len(tgt.versions()) == n1
    src.commit(_docs(spark, [(3, "cccc")]), mode="merge", merge_key="id",
               strategy="mor")
    _run()
    assert len(tgt.versions()) == n1 + 1
    assert _got(tgt) == _expected(src)
    # delete-only source commits produce no spurious target commit
    src.commit(
        spark.createDataFrame([(1,)], "id long"),
        mode="delete", merge_key="id", strategy="mor",
    )
    _run()
    assert len(tgt.versions()) == n1 + 1


def test_txn_stamp_and_last_txn(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_docs(spark, [(1, "a")]), txn=("appA", 7))
    t.commit(_docs(spark, [(2, "b")]))  # unstamped commit in between
    t.commit(_docs(spark, [(3, "c")]), txn=("appB", 1))
    assert t.last_txn("appA") == 7
    assert t.last_txn("appB") == 1
    assert t.last_txn("appC") is None
    t.commit(_docs(spark, [(4, "d")]), txn=("appA", 9))
    assert t.last_txn("appA") == 9


def test_follow_into_tracks_incremental_resplit(spark, tmp_path):
    """End-to-end CDC composition on the engine's own pipeline: run_split
    publishes the nodes table, a consumer derives an index from its change
    feed, an incremental re-split (MOR commit) advances the source, and
    the consumer catches up to exactly the derivation of the new head."""
    import datetime as dt

    from osm_history_splitter_spark.model import (
        NODE_SCHEMA,
        RELATION_SCHEMA,
        WAY_SCHEMA,
    )
    from osm_history_splitter_spark.plans.catalog import (
        Extract,
        ExtractCatalog,
    )
    from osm_history_splitter_spark.splitter import (
        incremental_resplit,
        run_split,
    )

    ts = dt.datetime(2020, 1, 1)

    def _nodes(rows):
        return spark.createDataFrame(
            [(i, v, True, ts, 0, 0, "u", p, p, {}) for i, v, p in rows],
            NODE_SCHEMA,
        )

    empty_w = spark.createDataFrame([], WAY_SCHEMA)
    empty_r = spark.createDataFrame([], RELATION_SCHEMA)
    cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    base = [(i, 1, 0.5) for i in range(8)]
    run_split(
        spark, _nodes(base), empty_w, empty_r, cat,
        str(tmp_path / "o1"), mode="softcut",
        checkpoint_dir=str(tmp_path / "ck1"),
        publish_table=str(tmp_path / "pub"),
    )
    src = VersionedTable(spark, str(tmp_path / "pub" / "nodes"))
    tgt = VersionedTable(spark, str(tmp_path / "idx"))

    def _index(batch):
        return batch.select(
            "id", "version", "extract",
            F.abs(F.hash("id", "version")).alias("key"),
        )

    def _run():
        q = follow_into(
            src, tgt, _index, merge_key=["id", "version", "extract"],
            checkpoint_dir=str(tmp_path / "ckq"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _run()
    assert tgt.read().count() == 8
    # CDC tick: one node gains a version -> MOR commit on the source
    incremental_resplit(
        spark, _nodes(base + [(3, 2, 0.5)]), empty_w, empty_r, cat,
        str(tmp_path / "pub"), str(tmp_path / "ck1"), str(tmp_path / "ck2"),
    )
    _run()
    want = sorted(
        (r["id"], r["version"], r["extract"])
        for r in src.read().collect()
    )
    got = sorted(
        (r["id"], r["version"], r["extract"]) for r in tgt.read().collect()
    )
    assert got == want
    assert (3, 2, "t") in got


def test_stream_changes_rejects_unknown_starting_version(spark, tmp_path):
    """Batch changes() raises on an unknown since; the stream twin must
    not silently replay the next snapshot as inserts."""
    import pytest

    from osm_history_splitter_spark.plans.table import VersionedTable
    from osm_history_splitter_spark.streaming.table_feed import stream_changes

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([(1,)], "id long"))
    with pytest.raises(Exception, match="startingVersion 7 not in"):
        stream_changes(spark, str(tmp_path / "t"), starting_version=7)


def test_stream_changes_handles_added_column(spark, tmp_path):
    """Schema evolution: files committed BEFORE a column existed stream
    back with typed nulls for it (the head schema drives the decode)."""
    from osm_history_splitter_spark.plans.table import VersionedTable
    from osm_history_splitter_spark.streaming.table_feed import stream_changes

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([(1,)], "id long"))
    t.commit(spark.createDataFrame([(2, 0.5)], "id long, score double"))
    q = (
        stream_changes(spark, str(tmp_path / "t"))
        .writeStream.format("memory")
        .queryName("evolved_feed")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["id"]: (r["score"], r["_change_version"])
        for r in spark.sql("select * from evolved_feed").collect()
    }
    assert rows == {1: (None, 1), 2: (0.5, 2)}
