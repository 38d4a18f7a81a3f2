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
