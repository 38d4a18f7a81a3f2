"""Streaming WARC ingestion (streaming/crawl_feed.py): the drained
stream equals the batch readers, late ticks append exactly the new
files' records, offsets are filenames."""

from __future__ import annotations

import ast

from osm_history_splitter_spark.sources import warc as W
from osm_history_splitter_spark.sources.pages import synth_pages
from osm_history_splitter_spark.streaming.crawl_feed import stream_crawl


def _pages(spark, testdata_sf):
    return synth_pages(spark, testdata_sf)


def _warc_rows(df):
    return sorted(
        (r["url"], r["warc_ts"], bytes(r["html"])) for r in df.collect()
    )


def test_stream_equals_batch_and_follows_ticks(spark, testdata_sf, tmp_path):
    drop = tmp_path / "drop"
    pages = _pages(spark, testdata_sf)
    b1, b2 = pages.limit(90), pages.subtract(pages.limit(90))
    W.write_warc(b1, str(drop), partitions=2, prefix="b000000-")
    q = (
        stream_crawl(spark, str(drop))
        .writeStream.format("memory")
        .queryName("crawl_feed_t")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert _warc_rows(spark.table("crawl_feed_t")) == _warc_rows(
            W.read_warc(spark, str(drop))
        )
        # a second fetch tick lands in the next micro-batch, nothing re-read
        W.write_warc(b2, str(drop), partitions=2, prefix="b000001-")
        q.processAllAvailable()
        assert _warc_rows(spark.table("crawl_feed_t")) == _warc_rows(
            pages.select("url", "warc_ts", "html")
        )
        off = q.lastProgress["sources"][0]["endOffset"]
        off = ast.literal_eval(off) if isinstance(off, str) else off
        assert off == {"file": "b000001-part-00001.warc.gz"}
    finally:
        q.stop()


def test_wet_kind_streams_text_and_lang(spark, testdata_sf, tmp_path):
    drop = tmp_path / "drop"
    pages = _pages(spark, testdata_sf).limit(60)
    W.write_warc(pages, str(drop), partitions=2, prefix="b000000-")
    q = (
        stream_crawl(spark, str(drop), kind="wet")
        .writeStream.format("memory")
        .queryName("crawl_feed_wet")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r["url"], r["warc_ts"], r["text"], r["lang"])
            for r in spark.table("crawl_feed_wet").collect()
        )
        want = sorted(
            (r["url"], r["warc_ts"], r["text"], r["lang"])
            for r in pages.collect()
        )
        assert got == want
    finally:
        q.stop()
