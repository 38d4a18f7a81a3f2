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


def test_triangles_k4_and_ring(spark):
    """K4 has exactly its 4 vertex triples; a 6-ring has none; reversed /
    duplicated input edges must not change the listing."""
    from osm_history_splitter_spark.operators.graph import triangles

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]
    got = {
        (r["a"], r["b"], r["c"])
        for r in triangles(
            spark.createDataFrame(k4, "src long, dst long")
        ).collect()
    }
    assert got == {(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)}
    ring = [(i, (i + 1) % 6) for i in range(6)]
    assert (
        triangles(spark.createDataFrame(ring, "src long, dst long")).count()
        == 0
    )


def test_triangles_random_differential(spark):
    import itertools
    import random

    from osm_history_splitter_spark.operators.graph import triangles

    for seed in (4, 5):
        rng = random.Random(seed)
        n = 18
        edges = {
            tuple(sorted((rng.randrange(n), rng.randrange(n))))
            for _ in range(45)
        }
        edges = [e for e in edges if e[0] != e[1]]
        adj = {v: set() for v in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        want = {
            (a, b, c)
            for a, b, c in itertools.combinations(range(n), 3)
            if b in adj[a] and c in adj[a] and c in adj[b]
        }
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {(r["a"], r["b"], r["c"]) for r in triangles(df).collect()}
        assert got == want, seed
