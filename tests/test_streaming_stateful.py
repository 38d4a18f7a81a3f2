"""§2.7 stateful streaming: watermarked hourly rollup and
applyInPandasWithState sessionize, each drained (availableNow) over the
testdata events backlog and compared row-for-row to its batch twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _event_stream(spark, tmp_path, subset=False):
    batch = spark.read.parquet(f"{SF}/events.parquet")
    if subset:  # stateful tests: fewer groups keeps the state store light
        batch = batch.filter(F.col("user_id") % 5 == 0)
    src = str(tmp_path / "events_src")
    batch.write.mode("overwrite").parquet(src)
    return batch, spark.readStream.schema(batch.schema).parquet(src)


def test_hourly_rollup_stream_matches_batch(spark, tmp_path):
    from osm_history_splitter_spark.streaming.stateful import hourly_rollup_stream
    from osm_history_splitter_spark.text_queries import q_events_hourly

    batch, stream = _event_stream(spark, tmp_path)
    rolled = hourly_rollup_stream(stream)
    q = (
        rolled.writeStream.format("memory")
        .queryName("hourly_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_h"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["hour_epoch"], r["event_type"]): (r["n"], r["sum_cents"])
        for r in spark.sql("SELECT * FROM hourly_sink").collect()
    }
    want = {
        (r["hour_epoch"], r["event_type"]): (r["n"], r["sum_cents"])
        for r in q_events_hourly(spark, SF).collect()
    }
    # append mode emits only windows the watermark has closed; the final
    # (open) hour per event_type may be withheld — everything emitted must
    # match the batch result exactly, and nearly all windows must emit
    assert got, "no windows emitted"
    for k, v in got.items():
        assert want[k] == v, (k, v, want[k])
    assert len(got) >= len(want) - 2 * len({k[1] for k in want})


def test_sessionize_stream_matches_batch(spark, tmp_path):
    from osm_history_splitter_spark.streaming.stateful import sessionize_stream
    from osm_history_splitter_spark.text_queries import q_sessionize

    batch, stream = _event_stream(spark, tmp_path, subset=True)
    sess = sessionize_stream(stream)
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_s"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # update mode re-emits open sessions per trigger: upsert by key, last
    # emission wins (the memory sink appends updates in trigger order)
    got = {}
    for r in spark.sql("SELECT * FROM sess_sink").collect():
        got[(r["user_id"], r["sess_no"])] = (
            r["n_events"], r["start_epoch"], r["end_epoch"]
        )
    # session numbering is per-user, so restricting to the same user subset
    # after the fact is exact
    want = {
        (r["user_id"], r["sess_no"]): (
            r["n_events"], r["start_epoch"], r["end_epoch"]
        )
        for r in q_sessionize(spark, SF).collect()
        if r["user_id"] % 5 == 0
    }
    assert got == want


def test_softcut_emit_stream_matches_batch_pass2(spark, tmp_path):
    """Late-arriving versions of tracked ids are emitted by the streaming
    pass-2 exactly as the batch join would emit them."""
    from osm_history_splitter_spark.streaming.hardcut_stream import (
        softcut_emit_stream,
    )

    markers = spark.createDataFrame(
        [(1, "a"), (2, "a"), (2, "b")], "id long, extract string"
    )
    arrivals = spark.createDataFrame(
        [(1, 3), (2, 9), (5, 1)], "id long, version int"
    )  # id 5 is untracked -> dropped
    src = str(tmp_path / "arrivals")
    arrivals.write.parquet(src)
    stream = spark.readStream.schema(arrivals.schema).parquet(src)
    q = softcut_emit_stream(
        stream, markers, str(tmp_path / "out"), str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    got = {
        (r["id"], r["version"], r["extract"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    want = {
        (r["id"], r["version"], r["extract"])
        for r in arrivals.join(markers, "id").collect()
    }
    assert got == want and len(got) == 3


def test_dedup_stream_matches_batch(spark, tmp_path):
    """Streaming exact dedup drained over a backlog with planted duplicate
    texts keeps exactly one row per distinct content hash — the same key
    set as the batch hash-groupBy (q_dedup_exact)."""
    from osm_history_splitter_spark.streaming.stateful import dedup_stream

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # plant duplicates: every doc appears again with a shifted id, same text
    dup = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    backlog = docs.unionByName(dup).withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(secs=F.col("doc_id") % 600)
    ).withColumn("text_md5", F.md5(F.col("text").cast("binary")))
    src = str(tmp_path / "docs_src")
    backlog.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(backlog.schema).parquet(src)

    deduped = dedup_stream(stream, ["text_md5"], ts_col="ts", watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_d"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.sql("SELECT text_md5 FROM dedup_sink").collect()
    got_keys = [r["text_md5"] for r in got]
    want_keys = {
        r["text_md5"]
        for r in backlog.select("text_md5").distinct().collect()
    }
    assert len(got_keys) == len(set(got_keys)), "sink emitted a duplicate key"
    assert set(got_keys) == want_keys


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """Watermarked stream-stream time-range join drained over the events
    backlog == the batch bucketed interval_join: same (error, click) pair
    set within ±600 s (the widest window that stays non-vacuous on the
    sparse sf0.001 user subset)."""
    from osm_history_splitter_spark.operators.interval import interval_join
    from osm_history_splitter_spark.streaming.stateful import (
        interval_join_stream,
    )

    batch, stream = _event_stream(spark, tmp_path, subset=True)
    errors_b = batch.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    clicks_b = batch.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    want = {
        (r["err_id"], r["click_id"])
        for r in interval_join(
            errors_b, clicks_b, "err_ts", "click_ts", 600_000_000
        ).collect()
    }

    errors_s = stream.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    clicks_s = stream.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    joined = interval_join_stream(
        errors_s, clicks_s, "err_ts", "click_ts", 600
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ij_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_ij"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["err_id"], r["click_id"])
        for r in spark.sql("SELECT err_id, click_id FROM ij_sink").collect()
    }
    assert got == want and got


def test_streaming_document_filters_match_batch(spark, tmp_path):
    """The corpus-cleaning FILTER stages (C4 heuristics, deterministic
    hash sampling) are stateless projections, so they run unchanged as
    streaming transformations — a drained backlog must keep exactly the
    batch twins' documents. This is the streaming form of the cleaning
    funnel's first stages: filter documents as they are crawled, before
    any stateful dedup."""
    from osm_history_splitter_spark import text_queries as tq

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    src = str(tmp_path / "docs_src")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)

    # re-apply the batch queries' own expressions to the stream: the
    # operator IS the expression, so this proves stream/batch identity
    text = F.col("text")
    lower = F.lower(text)
    n_words = F.size(F.split(text, " ")).cast("long")
    n_sents = (F.size(F.split(text, r"[.!?]")) - 1).cast("long")
    keep = (
        (n_sents >= 3)
        & (n_words >= 5)
        & text.rlike(r'[.!?"]\s*$')
        & ~text.contains("{")
        & ~lower.contains("javascript")
        & ~lower.contains("lorem ipsum")
    )
    flags = stream.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sents.alias("n_sentences"),
        keep.alias("kept"),
    )
    q = (
        flags.writeStream.format("memory")
        .queryName("c4_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_c4"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM c4_sink").collect()
    )
    want = sorted(
        (r["doc_id"], r["n_words"], r["n_sentences"], r["kept"])
        for r in tq.q_c4_filter(spark, SF).collect()
    )
    assert got == want and len(want) > 0  # full flag frame, per doc


def test_cms_sketch_stream_matches_batch(spark, tmp_path):
    """The streaming CMS in complete mode over a drained doc backlog must
    equal the batch sketch row-for-row — bounded-state (<= depth*width
    counters) frequency tracking on an endless crawl."""
    from osm_history_splitter_spark.streaming.stateful import cms_sketch_stream
    from osm_history_splitter_spark.text_queries import cms_sketch

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    src = str(tmp_path / "cms_src")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)

    q = (
        cms_sketch_stream(stream)
        .writeStream.format("memory")
        .queryName("cms_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_cms"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["i"], r["cell"]): r["n"]
        for r in spark.sql("SELECT * FROM cms_sink").collect()
    }
    want = {
        (r["i"], r["cell"]): r["n"] for r in cms_sketch(docs).collect()
    }
    assert got == want and len(want) > 100


def test_hll_registers_stream_matches_batch(spark, tmp_path):
    """Streaming HLL in complete mode over a drained doc backlog equals
    the batch register state — bounded (<= |langs|*256 rows) distinct
    tracking on an endless crawl, the cardinality twin of the CMS."""
    from osm_history_splitter_spark.streaming.stateful import (
        hll_registers_stream,
    )
    from osm_history_splitter_spark.text_queries import hll_registers

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    src = str(tmp_path / "hll_src")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)

    q = (
        hll_registers_stream(stream)
        .writeStream.format("memory")
        .queryName("hll_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_hll"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["lang"], r["reg"]): r["m"]
        for r in spark.sql("SELECT * FROM hll_sink").collect()
    }
    want = {
        (r["lang"], r["reg"]): r["m"] for r in hll_registers(docs).collect()
    }
    assert got == want and len(want) > 50


def test_trending_counts_stream_matches_batch(spark, tmp_path):
    """Drained trending counts == the batch query's pre-rank counts, and
    ranking the drained sink reproduces the batch top-k exactly."""
    from pyspark.sql import Window

    from osm_history_splitter_spark.streaming.stateful import (
        trending_counts_stream,
    )
    from osm_history_splitter_spark.text_queries import (
        TREND_K,
        q_trending_terms,
    )

    batch = spark.read.parquet(f"{SF}/documents.parquet")
    src = str(tmp_path / "docs_src")
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)

    q = (
        trending_counts_stream(stream)
        .writeStream.format("memory")
        .queryName("trend_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_t"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    drained = spark.sql("SELECT * FROM trend_sink")
    want_topk = {
        (r["win_epoch"], r["token"]): (r["n"], r["rank"])
        for r in q_trending_terms(spark, SF).collect()
    }
    # append mode may withhold still-open windows; every closed window's
    # counts must match the batch counts exactly
    got_counts = {
        (r["win_epoch"], r["token"]): r["n"] for r in drained.collect()
    }
    assert got_counts, "no windows emitted"
    # serving-side rank over the drained sink
    w = Window.partitionBy("win_epoch").orderBy(
        F.col("n").desc(), F.col("token").asc()
    )
    ranked = (
        drained.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TREND_K)
    )
    got_topk = {
        (r["win_epoch"], r["token"]): (r["n"], r["rank"])
        for r in ranked.collect()
    }
    emitted_windows = {k[0] for k in got_topk}
    for k, v in got_topk.items():
        assert want_topk[k] == v, (k, v, want_topk.get(k))
    # the final (open) window is withheld, and the watermark that closes
    # windows is the PREVIOUS micro-batch's max event time, so a second
    # window can lag one drain — same slack as the hourly-rollup test
    want_windows = {k[0] for k in want_topk}
    assert len(emitted_windows) >= len(want_windows) - 2


def test_rasterize_stream_matches_batch(spark, tmp_path):
    """Streaming heatmap in complete mode over a drained event backlog
    equals the batch raster — bounded state (occupied cells), the
    spatial member of the CMS/HLL family — and the drained snapshot is
    consumable by downstream raster ops (hotspot NMS runs on it)."""
    from osm_history_splitter_spark.operators.raster import local_maxima
    from osm_history_splitter_spark.streaming.stateful import (
        event_cell_counts,
        rasterize_stream,
    )

    batch, stream = _event_stream(spark, tmp_path)
    q = (
        rasterize_stream(stream, res=5)
        .writeStream.format("memory")
        .queryName("raster_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_r"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    drained = spark.sql("SELECT * FROM raster_sink")
    got = {r["cell"]: r["n"] for r in drained.collect()}
    want = {
        r["cell"]: r["n"] for r in event_cell_counts(batch, 5).collect()
    }
    assert got == want
    assert got, "empty raster"
    # the emitted snapshot is an ordinary raster: NMS over it works
    assert local_maxima(drained, 5, k=1).count() > 0
