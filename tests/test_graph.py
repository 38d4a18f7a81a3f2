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


import numpy as np  # noqa: E402
import pytest  # noqa: E402

from osm_history_splitter_spark.operators.graph import kcore  # noqa: E402


def _py_kcore(pairs, k):
    """Synchronous-peel reference (order-free fixpoint)."""
    adj: dict = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        low = {v for v in alive if len(adj[v] & alive) < k}
        if not low:
            return {v: len(adj[v] & alive) for v in alive}
        alive -= low


def test_kcore_k4_plus_tail(spark):
    # K5 clique with a pendant chain: the 4-core is exactly the clique
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    tail = [(4, 5), (5, 6)]
    df = spark.createDataFrame(clique + tail, "src long, dst long")
    got = {r.id: r.deg for r in kcore(df, 4).collect()}
    assert got == {v: 4 for v in range(5)}


def test_kcore_empty_core(spark):
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    assert kcore(df, 3).count() == 0


@pytest.mark.parametrize("seed,n,m,k", [(5, 40, 160, 3), (6, 60, 240, 4)])
def test_kcore_random_differential(spark, seed, n, m, k):
    rng = np.random.default_rng(seed)
    pairs = [
        (int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(m)
    ]
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {r.id: r.deg for r in kcore(df, k).collect()}
    want = _py_kcore(pairs, k)
    assert got == want
    assert want, "vacuous fixture — empty core"


def test_kcore_raises_past_round_bound(spark):
    # a length-6 chain peels one end pair per round at k=1? no — k=2:
    # a path peels from both ends, one layer per round: 3 rounds for 6
    # vertices; max_rounds=1 must raise
    path = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(path, "src long, dst long")
    with pytest.raises(RuntimeError):
        kcore(df, 2, max_rounds=1)


def test_kcore_validation(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        kcore(df, 0)


from osm_history_splitter_spark.operators.graph import hits  # noqa: E402


def _py_hits(pairs, num_iter=2, scale=10**6):
    """Integer max-renormalized HITS reference (same contract)."""
    verts = sorted({v for p in pairs for v in p})
    edges = sorted({(a, b) for a, b in pairs if a != b})
    hub = {v: scale for v in verts}
    auth = {}
    for _ in range(num_iter):
        raw_a = {}
        for s, d in edges:
            raw_a[d] = raw_a.get(d, 0) + hub[s]
        mx = max(raw_a.values(), default=0) or 1
        auth = {v: (x * scale) // mx for v, x in raw_a.items()}
        raw_h = {}
        for s, d in edges:
            raw_h[s] = raw_h.get(s, 0) + auth.get(d, 0)
        mx = max(raw_h.values(), default=0) or 1
        hub = {v: (x * scale) // mx for v, x in raw_h.items()}
    return {v: (auth.get(v, 0), hub.get(v, 0)) for v in verts}


def test_hits_star_graph(spark):
    # every spoke links to the center: center = sole authority (scale),
    # zero hub score; spokes are identical full-scale hubs, zero auth
    edges = [(i, 99) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: (r.auth, r.hub) for r in hits(df, num_iter=2).collect()}
    assert got[99] == (10**6, 0)
    assert all(got[i] == (0, 10**6) for i in range(1, 6))


@pytest.mark.parametrize("seed,n,m,it", [(7, 30, 120, 2), (8, 50, 200, 3)])
def test_hits_random_differential(spark, seed, n, m, it):
    rng = np.random.default_rng(seed)
    pairs = [
        (int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(m)
    ]
    df = spark.createDataFrame(pairs, "src long, dst long").filter(
        "src <> dst"
    ).distinct()
    got = {r.id: (r.auth, r.hub) for r in hits(df, num_iter=it).collect()}
    want = _py_hits(pairs, num_iter=it)
    assert got == want


def test_hits_linkless_vertices_get_zero(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    verts = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    got = {
        r.id: (r.auth, r.hub)
        for r in hits(edges, vertices=verts, num_iter=2).collect()
    }
    assert got[2] == (0, 0)
    assert got[1] == (10**6, 0) and got[0] == (0, 10**6)


def test_hits_validation(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        hits(df, num_iter=0)


def test_kcore_converges_at_exactly_max_rounds(spark):
    # 7-vertex path at k=2 peels one layer per round from both ends:
    # exactly 3 deletion rounds to the empty fixpoint. max_rounds=3
    # must CONVERGE (the bound brackets deletions, the last probe only
    # checks) — the round-5 off-by-one regression.
    path = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(path, "src long, dst long")
    assert kcore(df, 2, max_rounds=3).count() == 0
