"""Streaming change-data-feed over VersionedTable (streaming/table_feed.py):
offsets are snapshot versions, the stream equals the batch ``changes()``
feed, snapshot isolation holds, and checkpoint replay is exactly-once."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_history_splitter_spark.plans.table import VersionedTable


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(F.col("id"), F.lit(tag).alias("tag"))


def _offset(q):
    """endOffset arrives as the offset dict's string form in progress
    events — parse it back for a structural compare."""
    import ast

    off = q.lastProgress["sources"][0]["endOffset"]
    return ast.literal_eval(off) if isinstance(off, str) else off


def _rows(df):
    return sorted(
        (r["id"], r["tag"], r["_change_version"], r["_change_type"])
        for r in df.collect()
    )


def test_stream_equals_batch_changes_and_follows_commits(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5, "a"))
    t.commit(_df(spark, 3, 7, "b"), mode="merge", merge_key="id", strategy="mor")
    q = (
        t.stream_changes()
        .writeStream.format("memory")
        .queryName("feed_batch_eq")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert _rows(spark.table("feed_batch_eq")) == _rows(t.changes(0))
        # a commit made while the stream runs lands in the next micro-batch
        t.commit(_df(spark, 10, 12, "c"))
        q.processAllAvailable()
        assert _rows(spark.table("feed_batch_eq")) == _rows(t.changes(0))
        assert _offset(q) == {"version": 3}
    finally:
        q.stop()


def test_delete_only_commit_advances_offset_with_zero_rows(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5, "a"))
    q = (
        t.stream_changes()
        .writeStream.format("memory")
        .queryName("feed_del")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.table("feed_del").count()
        t.commit(
            spark.range(0, 2).select("id"),
            mode="delete",
            merge_key="id",
            strategy="mor",
        )
        q.processAllAvailable()
        # no new data files -> no rows, but the offset still reaches v2
        assert spark.table("feed_del").count() == n1 == 5
        assert _offset(q) == {"version": 2}
        # the delete half stays readable batch-side
        assert t.deleted_keys(2).count() == 2
    finally:
        q.stop()


def test_starting_version_skips_earlier_commits(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5, "a"))
    t.commit(_df(spark, 100, 103, "b"))
    q = (
        t.stream_changes(starting_version=1)
        .writeStream.format("memory")
        .queryName("feed_sv")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert _rows(spark.table("feed_sv")) == _rows(t.changes(1))
        assert {r["_change_version"] for r in spark.table("feed_sv").collect()} == {2}
    finally:
        q.stop()


def test_uncommitted_files_never_stream(spark, tmp_path):
    """Snapshot isolation: parquet landed without a manifest flip (a
    crashed commit attempt) must not surface as phantom rows — the reason
    this is a manifest-driven source, not a file stream over data/."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5, "a"))
    _df(spark, 900, 950, "ghost").write.parquet(
        str(tmp_path / "t" / "data" / "c99")
    )
    q = (
        t.stream_changes()
        .writeStream.format("memory")
        .queryName("feed_ghost")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("feed_ghost")
        assert got.count() == 5
        assert got.filter(F.col("tag") == "ghost").count() == 0
    finally:
        q.stop()


def test_checkpoint_restart_is_exactly_once(spark, tmp_path):
    """Stop the query, commit more, restart from the same checkpoint: the
    sink receives each commit's rows exactly once (manifest immutability
    makes offset-range replanning deterministic)."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    t.commit(_df(spark, 0, 4, "a"))

    def _run():
        q = (
            t.stream_changes()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _run()
    t.commit(_df(spark, 4, 9, "b"), mode="merge", merge_key="id", strategy="mor")
    _run()
    assert _rows(spark.read.parquet(sink)) == _rows(t.changes(0))
