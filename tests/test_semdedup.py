"""SemDeDup-style semantic dedup (operators/semdedup.py): lowest-vid
survivor per similarity neighborhood, chain domination, honest oversized-
cluster passthrough, partitioning invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_history_splitter_spark.operators.semdedup import semdedup


def _e(spark, rows):
    return spark.createDataFrame(rows, "vid long, q array<long>")


def _flags(df):
    return {
        r["vid"]: (r["kept"], r["attempted"]) for r in df.collect()
    }


def test_planted_duplicates_keep_lowest_vid(spark):
    """Two far-apart blobs; within blob A, vids 0/2/4 are near-identical
    (cos ~ 1) — only vid 0 survives; blob B's lone member is kept."""
    rows = [
        (0, [1000, 0]),
        (2, [1001, 0]),
        (4, [1000, 1]),
        (1, [0, 1000]),
        (7, [999, 5]),  # same direction as blob A -> dominated by vid 0
    ]
    got = _flags(semdedup(_e(spark, rows), k=2, num_iter=2, threshold=0.9))
    assert got[0] == (True, True)
    assert got[2] == (False, True)
    assert got[4] == (False, True)
    assert got[7] == (False, True)
    assert got[1] == (True, True)


def test_chain_domination_is_dominated_by_any_earlier(spark):
    """a-b similar, b-c similar, a-c NOT similar: the documented rule
    drops c too (dominated by b even though b was itself dropped) —
    stricter than leader-greedy, and exactly what the SQL twin computes."""
    # unit-ish 2d vectors at 0°, 30°, 60°: cos30 ~ .866, cos60 = .5
    a = [100000, 0]
    b = [86603, 50000]
    c = [50000, 86603]
    got = _flags(
        semdedup(_e(spark, [(1, a), (2, b), (3, c)]), k=1, num_iter=1,
                 threshold=0.85)
    )
    assert got == {1: (True, True), 2: (False, True), 3: (False, True)}


def test_oversized_cluster_passes_through_observably(spark):
    """Rows of clusters over cluster_cap are NOT silently truncated: all
    kept, flagged attempted=false — the LSH-cap honesty contract."""
    rows = [(i, [1000 + i, 0]) for i in range(6)] + [(10, [0, 1000])]
    out = semdedup(
        _e(spark, rows), k=2, num_iter=1, threshold=0.9, cluster_cap=3
    )
    got = _flags(out)
    # the 6-member near-dup cluster exceeds the cap: untouched, flagged
    assert all(got[i] == (True, False) for i in range(6))
    assert got[10] == (True, True)
    # the honest-drop count is one plain filter away
    assert out.filter(~F.col("attempted")).count() == 6


def test_partitioning_invariance(spark):
    rows = [(i, [1000, i % 3]) for i in range(12)] + [
        (100 + i, [i % 4, 1000]) for i in range(8)
    ]
    e = _e(spark, rows)
    a = _flags(semdedup(e, k=2, num_iter=2, threshold=0.95))
    b = _flags(semdedup(e.repartition(7, "vid"), k=2, num_iter=2,
                        threshold=0.95))
    assert a == b


def test_zero_vector_is_never_a_duplicate(spark):
    """cos with a zero vector is undefined (0/0) — the dot>0 guard keeps
    zero vectors on both engines instead of nan-poisoning the compare."""
    got = _flags(
        semdedup(
            _e(spark, [(1, [0, 0]), (2, [0, 0]), (3, [500, 0])]),
            k=1, num_iter=1, threshold=0.9,
        )
    )
    assert got == {1: (True, True), 2: (True, True), 3: (True, True)}
