"""Deterministic k-means: separation on planted blobs, empty-cluster
centroid retention, exact integer centroid update."""

from __future__ import annotations

from osm_history_splitter_spark.operators.kmeans import kmeans


def _e(spark, rows):
    return spark.createDataFrame(rows, "vid long, q array<long>")


def test_kmeans_separates_planted_blobs(spark):
    """Two tight blobs far apart, seeds vid 0 (blob A) and vid 1 (blob B):
    every point lands with its blob, and re-running gives the identical
    assignment (determinism)."""
    blob_a = [(0, [0, 0]), (2, [1, 0]), (4, [0, 1]), (6, [1, 1])]
    blob_b = [(1, [1000, 1000]), (3, [1001, 1000]), (5, [1000, 1001])]
    e = _e(spark, blob_a + blob_b)
    out1, cents1 = kmeans(e, k=2, num_iter=2)
    r1 = {r["vid"]: r["cluster"] for r in out1.collect()}
    assert {r1[v] for v, _ in blob_a} == {0}
    assert {r1[v] for v, _ in blob_b} == {1}
    out2, cents2 = kmeans(e, k=2, num_iter=2)
    assert {r["vid"]: r["cluster"] for r in out2.collect()} == r1
    assert cents1 == cents2


def test_kmeans_truncated_floor_centroid(spark):
    """Centroid of [0] and [-3] is floor(-3/2) = -2 (floor, not
    truncate-toward-zero) — the exact cross-engine contract."""
    e = _e(spark, [(0, [0]), (1, [100]), (2, [-3])])
    # seeds: vid0 -> cluster0 at [0], vid1 -> cluster1 at [100];
    # vid2 ([-3]) joins cluster0 -> centroid floor((0-3)/2) = -2
    _out, cents = kmeans(e, k=2, num_iter=1)
    assert cents[0] == [-2]
    assert cents[1] == [100]


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """Duplicate seed points: every row ties to the lower cluster, so the
    higher seed captures nothing and must keep its previous centroid
    instead of degenerating."""
    e = _e(spark, [(0, [0]), (1, [0]), (2, [7])])
    _out, cents = kmeans(e, k=2, num_iter=1)
    # iter 1: every point ties/lands on cluster 0 -> cluster 1 is empty
    assert cents[1] == [0]  # empty: previous centroid retained
    assert cents[0] == [2]  # floor((0 + 0 + 7) / 3)


def test_kmeans_tie_breaks_to_lowest_cluster(spark):
    """A point exactly equidistant from both centroids goes to the lower
    cluster id in both engines (array_position first-match). num_iter=0
    assigns against the raw seeds, where [5] is 25 from both."""
    e = _e(spark, [(0, [0]), (1, [10]), (2, [5])])
    out, _ = kmeans(e, k=2, num_iter=0)
    r = {x["vid"]: x["cluster"] for x in out.collect()}
    assert r == {0: 0, 1: 1, 2: 0}
