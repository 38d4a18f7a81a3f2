"""PageRank operator: symmetry, hub dominance, vertex-set handling."""

from __future__ import annotations

from osm_history_splitter_spark.operators.graph import pagerank


def _ranks(df):
    return {r["id"]: r["pr"] for r in df.collect()}


def test_pagerank_ring_is_symmetric(spark):
    """On a directed ring every vertex is structurally identical — all
    ranks must be exactly equal (integer arithmetic: no drift)."""
    n = 12
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    pr = _ranks(pagerank(edges, num_iter=4))
    assert len(set(pr.values())) == 1 and len(pr) == n


def test_pagerank_hub_dominates(spark):
    """A vertex receiving every other vertex's only outlink outranks all,
    and spokes that receive nothing sit at the base rank."""
    n = 10
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, n)], "src long, dst long"
    )
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    pr = _ranks(pagerank(edges, vertices=verts, num_iter=3))
    assert pr[0] == max(pr.values()) > pr[1]
    base = 10**9 * 15 // 100
    assert all(pr[i] == base for i in range(1, n))


def test_pagerank_zero_iters_is_initial_rank(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    pr = _ranks(pagerank(edges, num_iter=0))
    assert pr == {1: 10**9, 2: 10**9}


def test_pagerank_sink_only_vertex_keeps_base_plus_inflow(spark):
    """src=1 -> dst=2 with no other edges: 2 gets base + 85% of 1's full
    rank (outdeg 1), 1 falls to base. Exact integer expectations."""
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    pr = _ranks(pagerank(edges, num_iter=1))
    base = 10**9 * 15 // 100
    assert pr[1] == base
    assert pr[2] == base + (85 * 10**9) // 100
