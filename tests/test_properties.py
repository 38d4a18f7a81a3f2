"""T5 — randomized equivalence: Spark operators vs the in-memory reference
semantics on random small worlds, plus the softcut invariants from
reference ``softcut.hpp:56-59``."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from osm_history_splitter_spark.model import (
    NODE_SCHEMA,
    RELATION_SCHEMA,
    WAY_SCHEMA,
)
from osm_history_splitter_spark.operators.hardcut import hardcut
from osm_history_splitter_spark.operators.softcut import softcut
from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog

from .reference_impl import hardcut_ref, softcut_ref

TS = dt.datetime(2020, 1, 1)


def random_world(seed: int):
    rng = np.random.default_rng(seed)
    n_nodes = int(rng.integers(20, 60))
    nodes = []
    for i in range(1, n_nodes + 1):
        for v in range(1, int(rng.integers(1, 4)) + 1):
            nodes.append(
                (i, v, float(rng.uniform(-20, 20)), float(rng.uniform(-20, 20)))
            )
    ways = []
    for i in range(100, 100 + int(rng.integers(5, 15))):
        for v in range(1, int(rng.integers(1, 3)) + 1):
            k = int(rng.integers(1, 6))
            refs = [int(r) for r in rng.integers(1, n_nodes + 3, k)]  # some dead refs
            ways.append((i, v, refs))
    relations = []
    rel_ids = list(range(500, 500 + int(rng.integers(3, 8))))
    for i in rel_ids:
        members = []
        for _ in range(int(rng.integers(1, 5))):
            t = str(rng.choice(["n", "w", "r"]))
            if t == "n":
                ref = int(rng.integers(1, n_nodes + 3))
            elif t == "w":
                ref = int(rng.integers(100, 120))
            else:
                ref = int(rng.choice(rel_ids))  # forward AND backward refs
            members.append((t, ref))
        relations.append((i, 1, members))
    return nodes, ways, relations


def to_dfs(spark, nodes, ways, relations):
    ndf = spark.createDataFrame(
        [(i, v, True, TS, 0, 0, "u", lat, lon, {}) for i, v, lon, lat in nodes],
        schema=NODE_SCHEMA,
    )
    wdf = spark.createDataFrame(
        [(i, v, True, TS, 0, 0, "u", refs, {}) for i, v, refs in ways],
        schema=WAY_SCHEMA,
    )
    rdf = spark.createDataFrame(
        [
            (i, v, True, TS, 0, 0, "u", [(t, r, "") for t, r in members], {})
            for i, v, members in relations
        ],
        schema=RELATION_SCHEMA,
    )
    return ndf, wdf, rdf


BBOX = (-10.0, -10.0, 10.0, 10.0)
DIAMOND_RINGS = [[[0.0, -12.0], [12.0, 0.0], [0.0, 12.0], [-12.0, 0.0], [0.0, -12.0]]]


def catalog():
    return ExtractCatalog(
        [
            Extract.bbox("box", *BBOX),
            Extract.poly("dia", DIAMOND_RINGS),
        ]
    )


def pred_box(lon, lat):
    return BBOX[0] < lon < BBOX[2] and BBOX[1] < lat < BBOX[3]


def pred_dia(lon, lat):
    return abs(lon) / 12.0 + abs(lat) / 12.0 < 1.0


PREDS = {"box": pred_box, "dia": pred_dia}


@pytest.mark.parametrize("seed", [1, 2, 3, 7, 13, 42])
def test_softcut_matches_reference_semantics(spark, seed):
    nodes, ways, relations = random_world(seed)
    ndf, wdf, rdf = to_dfs(spark, nodes, ways, relations)
    res = softcut(ndf, wdf, rdf, catalog(), persist=False)
    expected = softcut_ref(nodes, ways, relations, PREDS)

    got_nodes = {
        (r["extract"], r["id"]) for r in res.nodes.select("extract", "id").distinct().collect()
    }
    exp_nodes = {(e, i) for e, m in expected.items() for i in m["nodes"]}
    # restrict expectation to node ids that exist in the nodes table (extra
    # refs may point at nonexistent nodes — membership exists, rows don't)
    present = {n[0] for n in nodes}
    exp_nodes = {(e, i) for e, i in exp_nodes if i in present}
    assert got_nodes == exp_nodes

    got_ways = {
        (r["extract"], r["id"]) for r in res.ways.select("extract", "id").distinct().collect()
    }
    assert got_ways == {(e, i) for e, m in expected.items() for i in m["ways"]}

    got_rels = {
        (r["extract"], r["id"]) for r in res.relations.select("extract", "id").distinct().collect()
    }
    assert got_rels == {(e, i) for e, m in expected.items() for i in m["relations"]}

    # invariants (softcut.hpp:56-59): history-completeness — all versions of
    # a member id are present
    all_versions = {}
    for i, v, *_ in nodes:
        all_versions.setdefault(i, set()).add(v)
    got_nv = {}
    for r in res.nodes.select("extract", "id", "version").collect():
        got_nv.setdefault((r["extract"], r["id"]), set()).add(r["version"])
    for (e, i), versions in got_nv.items():
        assert versions == all_versions[i], "history-incomplete node output"


@pytest.mark.parametrize("seed", [1, 2, 3, 7, 13, 42])
def test_hardcut_matches_reference_semantics(spark, seed):
    nodes, ways, relations = random_world(seed)
    ndf, wdf, rdf = to_dfs(spark, nodes, ways, relations)
    res = hardcut(ndf, wdf, rdf, catalog())
    expected = hardcut_ref(nodes, ways, relations, PREDS)

    got_nv = {
        (r["extract"], r["id"], r["version"])
        for r in res.nodes.select("extract", "id", "version").collect()
    }
    exp_nv = {
        (e, i, v) for e, m in expected.items() for i, v in m["node_versions"]
    }
    assert got_nv == exp_nv

    got_ways = {
        (r["extract"], r["id"], r["version"], tuple(r["refs"]))
        for r in res.ways.select("extract", "id", "version", "refs").collect()
    }
    exp_ways = {
        (e, i, v, tuple(refs))
        for e, m in expected.items()
        for (i, v), refs in m["ways"].items()
    }
    assert got_ways == exp_ways

    got_rels = {
        (r["extract"], r["id"], r["version"])
        for r in res.relations.select("extract", "id", "version").collect()
    }
    exp_rels = {
        (e, i, v) for e, m in expected.items() for (i, v) in m["relations"]
    }
    assert got_rels == exp_rels

    # hardcut ⊆ softcut per id (weaker-completeness containment)
    soft = softcut_ref(nodes, ways, relations, PREDS)
    for e in expected:
        assert {i for i, _ in expected[e]["node_versions"]} <= soft[e]["nodes"]
        assert {i for i, _ in expected[e]["ways"]} <= soft[e]["ways"]


def _naive_asof(left_rows, right_rows):
    """Pure-python as-of oracle: latest right with same key and ts <= left ts."""
    out = {}
    for eid, key, lts in left_rows:
        best = None
        for rkey, rts, payload in right_rows:
            if rkey == key and rts <= lts and (best is None or rts > best[0]
                                               or (rts == best[0] and payload > best[1])):
                best = (rts, payload)
        out[eid] = best[1] if best else None
    return out


@pytest.mark.parametrize("seed", [1, 7, 19])
def test_asof_join_random_equivalence(spark, seed):
    from osm_history_splitter_spark.operators.asof import asof_join

    rng = np.random.default_rng(seed)
    left_rows = [
        (int(i), int(rng.integers(0, 6)), int(rng.integers(0, 50)))
        for i in range(120)
    ]
    # right unique per (key, ts) — the operator's documented contract
    seen = {}
    for _ in range(40):
        k, t = int(rng.integers(0, 6)), int(rng.integers(0, 50))
        seen[(k, t)] = max(seen.get((k, t), 0), int(rng.integers(1, 1000)))
    right_rows = [(k, t, p) for (k, t), p in seen.items()]

    left = spark.createDataFrame(left_rows, "event_id long, user_id long, tse long")
    right = spark.createDataFrame(right_rows, "user_id long, snap_ts long, snap_id long")
    got = {
        r["event_id"]: r["snap_id"]
        for r in asof_join(
            left, right, on=["user_id"], left_ts="tse",
            right_ts="snap_ts", payload_cols=["snap_id"],
        ).collect()
    }
    want = _naive_asof(left_rows, right_rows)
    assert got == want


def test_asof_join_null_payload_is_attached_not_skipped(spark):
    """A right row whose payload IS null must be attached as the match
    (DuckDB ASOF JOIN semantics), not skipped in favor of a stale older
    non-null row; and multi-column payloads must come from ONE right row."""
    from osm_history_splitter_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 15)], "event_id long, user_id long, tse long"
    )
    right = spark.createDataFrame(
        [(10, 5, 111, "old"), (10, 50, None, "new")],
        "user_id long, snap_ts long, snap_id long, tag string",
    )
    got = {
        r["event_id"]: (r["snap_id"], r["tag"])
        for r in asof_join(
            left, right, on=["user_id"], left_ts="tse",
            right_ts="snap_ts", payload_cols=["snap_id", "tag"],
        ).collect()
    }
    # event 1 (ts=100): latest right is ts=50 whose snap_id is NULL — the
    # null is the answer, and tag must come from the SAME row ("new")
    assert got[1] == (None, "new"), got
    # event 2 (ts=15): only ts=5 precedes
    assert got[2] == (111, "old"), got


def test_asof_join_no_preceding_right_row_yields_nulls(spark):
    from osm_history_splitter_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10, 3)], "event_id long, user_id long, tse long")
    right = spark.createDataFrame(
        [(10, 50, 7)], "user_id long, snap_ts long, snap_id long"
    )
    rows = asof_join(
        left, right, on=["user_id"], left_ts="tse",
        right_ts="snap_ts", payload_cols=["snap_id"],
    ).collect()
    assert len(rows) == 1 and rows[0]["snap_id"] is None


def test_connected_components_long_chain_pointer_jumping(spark):
    """A 10k-vertex path graph — the adversarial case for plain min-label
    propagation (O(diameter) rounds) — must converge in O(log diameter)
    rounds via the pointer-jumping step, with the exact min labels."""
    from osm_history_splitter_spark.operators.dedup import connected_components

    n = 10_000
    pairs = spark.range(n - 1).selectExpr("id AS doc_a", "id + 1 AS doc_b")
    stats: dict = {}
    # driver_fastpath_max=0 forces the distributed loop — the fast path
    # would otherwise absorb this graph and leave the loop untested
    cc = connected_components(pairs, _stats=stats, driver_fastpath_max=0)
    assert 0 < stats["rounds"] < 16, stats  # ~log(10k); 30 would time out
    got = cc.groupBy("cluster_id").count().collect()
    assert len(got) == 1 and got[0]["cluster_id"] == 0 and got[0]["count"] == n


def test_connected_components_fastpath_matches_loop(spark):
    """The driver union-find fast path and the distributed loop are the
    same operator: identical (doc_id, cluster_id) sets on a mixed graph
    (cliques + a chain + isolated pairs)."""
    from osm_history_splitter_spark.operators.dedup import connected_components

    rows = (
        [(i, j) for i in range(5) for j in range(i + 1, 5)]  # clique 0-4
        + [(100 + i, 101 + i) for i in range(20)]  # chain
        + [(1000, 2000), (3000, 4000)]  # isolated pairs
    )
    pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
    fast = sorted(
        tuple(r) for r in connected_components(pairs).collect()
    )
    loop = sorted(
        tuple(r)
        for r in connected_components(pairs, driver_fastpath_max=0).collect()
    )
    assert fast == loop and len(fast) == 5 + 21 + 4


@pytest.mark.parametrize("seed", [3, 11])
def test_connected_components_random_vs_union_find(spark, seed):
    from osm_history_splitter_spark.operators.dedup import connected_components

    rng = np.random.default_rng(seed)
    edges = {
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 40, 80), rng.integers(0, 40, 80))
        if a != b
    }
    # pure-python union-find oracle
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in parent}

    pairs = spark.createDataFrame(list(edges), "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == want
