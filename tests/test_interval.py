"""Interval (range) join: bucketed equi-join == naive non-equi join, edge
inclusivity, left semantics, plan shape; chunk-dedup reconstruction
invariant."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from osm_history_splitter_spark.operators.interval import interval_join

T0 = dt.datetime(2024, 1, 1)


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def sides(spark):
    import random

    rng = random.Random(7)
    left = spark.createDataFrame(
        [(i, _ts(rng.uniform(0, 3600))) for i in range(400)],
        "lid long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(1000 + i, _ts(rng.uniform(0, 3600))) for i in range(400)],
        "rid long, rts timestamp",
    )
    return left, right


def _naive_pairs(left, right, tol_us):
    lt = {r["lid"]: r["lts"] for r in left.collect()}
    rt = {r["rid"]: r["rts"] for r in right.collect()}
    out = set()
    for lid, lts in lt.items():
        for rid, rts in rt.items():
            if abs((rts - lts).total_seconds() * 1e6) <= tol_us + 1e-9:
                out.add((lid, rid))
    return out


def test_interval_join_matches_naive(spark, sides):
    left, right = sides
    tol = 60_000_000
    got = {
        (r["lid"], r["rid"])
        for r in interval_join(left, right, "lts", "rts", tol).collect()
    }
    assert got == _naive_pairs(left, right, tol) and got


def test_interval_join_bucket_width_irrelevant(spark, sides):
    """Any bucket width >= tol yields the same pairs (cover completeness)."""
    left, right = sides
    tol = 45_000_000
    base = {
        (r["lid"], r["rid"])
        for r in interval_join(left, right, "lts", "rts", tol).collect()
    }
    wide = {
        (r["lid"], r["rid"])
        for r in interval_join(
            left, right, "lts", "rts", tol, bucket_us=300_000_000
        ).collect()
    }
    assert base == wide


def test_interval_join_edge_inclusive(spark):
    left = spark.createDataFrame([(1, _ts(0))], "lid long, lts timestamp")
    right = spark.createDataFrame(
        [(10, _ts(60)), (11, _ts(60.000001)), (12, _ts(-60))],
        "rid long, rts timestamp",
    )
    got = {
        (r["rid"], r["__dt_us"])
        for r in interval_join(
            left, right, "lts", "rts", 60_000_000
        ).collect()
    }
    # exactly ±tol is IN; one microsecond past is OUT
    assert got == {(10, 60_000_000), (12, -60_000_000)}


def test_interval_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(10_000))], "lid long, lts timestamp"
    )
    right = spark.createDataFrame([(10, _ts(30))], "rid long, rts timestamp")
    rows = interval_join(
        left, right, "lts", "rts", 60_000_000, how="left", left_id="lid"
    ).collect()
    by_lid = {r["lid"]: r for r in rows}
    assert len(rows) == 2
    assert by_lid[1]["rid"] == 10
    assert by_lid[2]["rid"] is None and by_lid[2]["__dt_us"] is None
    with pytest.raises(ValueError, match="left_id"):
        interval_join(left, right, "lts", "rts", 1, how="left")


def test_interval_join_plan_is_hash_join(spark, sides):
    """The non-equi tolerance must ride an equi hash join on the bucket —
    never BroadcastNestedLoopJoin / CartesianProduct."""
    from tests.test_plans import plan_of

    left, right = sides
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(interval_join(left, right, "lts", "rts", 60_000_000))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastNestedLoopJoin" not in plan and "Cartesian" not in plan
    assert "Join" in plan


def test_chunk_dedup_reconstructs_unique_corpus(spark, tmp_path):
    """On a corpus with NO repeated chunk, clean_text == text byte-for-byte
    and dropped_chunks == 0; a planted cross-doc duplicate chunk survives
    only in the lower doc_id."""
    from osm_history_splitter_spark.text_queries import q_chunk_dedup

    docs = [
        (0, " ".join(f"u0w{j}" for j in range(23)), "en", "s", 0),
        (1, " ".join(f"v{j}" for j in range(10)), "en", "s", 0),
        # doc 2 repeats doc 0's FIRST 10-word chunk, then unique tail
        (2, " ".join(f"u0w{j}" for j in range(10)) + " "
            + " ".join(f"z{j}" for j in range(5)), "en", "s", 0),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in q_chunk_dedup(spark, str(tmp_path)).collect()}
    assert out[0]["clean_text"] == docs[0][1] and out[0]["dropped_chunks"] == 0
    assert out[1]["clean_text"] == docs[1][1] and out[1]["dropped_chunks"] == 0
    assert out[2]["dropped_chunks"] == 1 and out[2]["kept_chunks"] == 1
    assert out[2]["clean_text"] == " ".join(f"z{j}" for j in range(5))


def test_chunk_dedup_matches_python_reference_on_random_corpus(spark, tmp_path):
    """Seeded random corpus over a 6-word vocabulary (forcing heavy chunk
    collisions) vs an independent pure-Python implementation of the
    globally-first-occurrence semantics."""
    import random

    from osm_history_splitter_spark.text_queries import q_chunk_dedup

    rng = random.Random(42)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    docs = {
        did: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 35)))
        for did in range(40)
    }

    # pure-Python reference
    first = set()
    want = {}
    for did in sorted(docs):
        words = docs[did].split(" ")
        kept, dropped = [], 0
        for g in range(0, len(words), 10):
            chunk = " ".join(words[g : g + 10])
            if chunk in first:
                dropped += 1
            else:
                first.add(chunk)
                kept.append(chunk)
        want[did] = (" ".join(kept), len(kept), dropped)

    spark.createDataFrame(
        [(d, t, "en", "s", len(t)) for d, t in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["clean_text"], r["kept_chunks"], r["dropped_chunks"])
        for r in q_chunk_dedup(spark, str(tmp_path)).collect()
    }
    assert got == want


def test_asof_null_right_ts_never_matches(spark):
    """A right row with NULL right_ts cannot satisfy right_ts <= left_ts:
    it must not be attached to any left row (asc-nulls-first ordering
    previously attached its payload to EVERY left row)."""
    from osm_history_splitter_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100)], "k long, tse long")
    right = spark.createDataFrame(
        [(1, None, "ghost")], "k long, rts long, tag string"
    )
    out = asof_join(
        left, right, on=["k"], left_ts="tse", right_ts="rts",
        payload_cols=["tag"],
    ).collect()
    assert len(out) == 1 and out[0]["tag"] is None
    # a real preceding row still matches
    right2 = spark.createDataFrame(
        [(1, None, "ghost"), (1, 50, "real")], "k long, rts long, tag string"
    )
    out2 = asof_join(
        left, right2, on=["k"], left_ts="tse", right_ts="rts",
        payload_cols=["tag"],
    ).collect()
    assert out2[0]["tag"] == "real"


def test_asof_rejects_payload_collision(spark):
    import pytest

    from osm_history_splitter_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100, "x")], "k long, tse long, tag string")
    right = spark.createDataFrame([(1, 50, "y")], "k long, rts long, tag string")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on=["k"], left_ts="tse", right_ts="rts",
                  payload_cols=["tag"])
