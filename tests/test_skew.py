"""salted_join: row-for-row equivalence with the plain join on a skewed
corpus, salt distribution actually spreads the hot key, plan stays a
hash join."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_history_splitter_spark.operators.skew import salted_join


def _skewed(spark):
    # 5000 rows of one mega-key + 500 spread keys
    left = spark.range(5500).select(
        F.when(F.col("id") < 5000, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame(
        [(7, "hot"), (5100, "a"), (5200, "b"), (9999, "nomatch")],
        "k long, tag string",
    )
    return left, right


def test_salted_join_matches_plain_inner(spark):
    left, right = _skewed(spark)
    want = sorted(
        (r["k"], r["payload"], r["tag"])
        for r in left.join(right, "k").collect()
    )
    got = sorted(
        (r["k"], r["payload"], r["tag"])
        for r in salted_join(left, right, "k", salt=8).collect()
    )
    assert got == want and len(got) == 5002


def test_salted_join_matches_plain_left(spark):
    left, right = _skewed(spark)
    want = sorted(
        (r["k"], r["payload"], r["tag"])
        for r in left.join(right, "k", "left").collect()
    )
    got = sorted(
        (r["k"], r["payload"], r["tag"])
        for r in salted_join(left, right, "k", salt=8, how="left").collect()
    )
    assert got == want and len(got) == 5500


def test_salt_spreads_the_hot_key(spark):
    """The mega-key's rows must land in (nearly) all salt buckets — the
    whole point of salting."""
    left, _ = _skewed(spark)
    hashable = [c for c, t in left.dtypes if not t.startswith("map<")]
    buckets = (
        left.filter(F.col("k") == 7)
        .select(
            F.pmod(
                F.xxhash64(F.lit("skew-salt"), *[F.col(c) for c in hashable]),
                F.lit(8),
            ).alias("b")
        )
        .distinct()
        .count()
    )
    assert buckets == 8


def test_salted_join_plan_is_hash_join(spark):
    from tests.test_plans import plan_of

    left, right = _skewed(spark)
    plan = plan_of(salted_join(left, right, "k", salt=8))
    assert "Cartesian" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_salted_join_rejects_right_and_full(spark):
    left, right = _skewed(spark)
    import pytest

    with pytest.raises(ValueError, match="inner|left"):
        salted_join(left, right, "k", how="full")
