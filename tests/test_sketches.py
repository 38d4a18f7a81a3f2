"""Sketch-family queries: count-min (cms_counts) and HyperLogLog
(hll_distinct) — the CMS upper-bound guarantee against exact counts,
the HLL estimate against exact distincts, and SSSP against a Python
bounded Bellman-Ford. The cross-engine hash identity is certified
separately by tests/test_driver_excluded.py; these are the semantic
properties the twin can't express."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from osm_history_splitter_spark.operators.graph import sssp_dists
from osm_history_splitter_spark.text_queries import (
    q_cms_counts,
    q_hll_distinct,
)


def test_cms_estimate_upper_bounds_exact(spark, testdata_sf):
    """CMS guarantee: est(w) >= true count for EVERY probe word, and the
    total overshoot is bounded (depth 4 x width 1024 over this corpus
    collides rarely — most probes must be exact)."""
    est = {r["w"]: r["est"] for r in q_cms_counts(spark, testdata_sf).collect()}
    assert est, "probe set must be non-empty"
    d = spark.read.parquet(f"{testdata_sf}/documents.parquet")
    words = d.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.col("w") != ""
    )
    exact = {
        r["w"]: r["n"]
        for r in words.groupBy("w").agg(F.count("*").alias("n")).collect()
        if r["w"] in est
    }
    assert set(exact) == set(est)
    assert all(est[w] >= exact[w] for w in est)
    n_exact = sum(1 for w in est if est[w] == exact[w])
    assert n_exact >= len(est) * 0.9, (n_exact, len(est))


def test_hll_estimate_tracks_exact_distinct(spark, testdata_sf):
    """HLL with m=256 has ~6.5% standard error; assert every per-lang
    estimate — after the standard small-range linear-counting correction
    the query contract leaves to the consumer — lands within 25% of the
    exact distinct-token count, and the register state is internally
    consistent (m_used <= 256, s_num in its dyadic range)."""
    import math
    out = {
        r["lang"]: r for r in q_hll_distinct(spark, testdata_sf).collect()
    }
    d = spark.read.parquet(f"{testdata_sf}/documents.parquet")
    exact = {
        r["lang"]: r["n"]
        for r in d.select(
            "lang", F.explode(F.split("text", " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("lang")
        .agg(F.countDistinct("w").alias("n"))
        .collect()
    }
    assert set(out) == set(exact)
    m = 256
    for lang, r in out.items():
        assert 0 < r["m_used"] <= m
        assert 0 < r["s_num"] <= m * (1 << 25)
        est = r["est_distinct"]
        if est <= 5 * m // 2 and r["m_used"] < m:
            est = m * math.log(m / (m - r["m_used"]))
        lo, hi = exact[lang] * 0.75, exact[lang] * 1.25
        assert lo <= est <= hi, (lang, r, exact[lang])


def _py_bf(edges, src, hops):
    """Full-relaxation bounded Bellman-Ford: min dist over <=h-hop paths."""
    dist = {src: 0}
    for _ in range(hops):
        prev = dict(dist)
        for s, d, w in edges:
            if s in prev and prev[s] + w < dist.get(d, float("inf")):
                dist[d] = prev[s] + w
    return dist


def _spark_sssp(spark, edges, src, hops):
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    s = spark.createDataFrame([(src,)], "id long")
    return {
        r["id"]: r["dist"] for r in sssp_dists(e, s, max_hops=hops).collect()
    }


def test_sssp_longer_hop_path_wins(spark):
    """0->1 direct costs 10; 0->2->3->1 costs 3 but needs 3 hops: the
    bound must control which answer appears — the case that proves
    vertices get RE-improved across rounds, not just first-reached."""
    edges = [(0, 1, 10), (0, 2, 1), (2, 3, 1), (3, 1, 1)]
    assert _spark_sssp(spark, edges, 0, 1)[1] == 10
    assert _spark_sssp(spark, edges, 0, 6)[1] == 3


def test_sssp_unreachable_excluded_and_fixpoint_stops(spark):
    edges = [(0, 1, 2), (2, 3, 1)]  # 2,3 in another component
    got = _spark_sssp(spark, edges, 0, 8)
    assert got == {0: 0, 1: 2}


def test_sssp_random_differential(spark):
    for seed in (11, 12, 13):
        rng = random.Random(seed)
        n = 25
        edges = [
            (rng.randrange(n), rng.randrange(n), rng.randint(1, 9))
            for _ in range(60)
        ]
        edges = [(s, d, w) for s, d, w in edges if s != d]
        for hops in (2, 5):
            assert _spark_sssp(spark, edges, 0, hops) == _py_bf(
                edges, 0, hops
            ), (seed, hops)


def test_co_citation_cap_binds_deterministically(spark):
    """A 12-host page under CAP=8: exactly C(8,2)=28 pairs, from the 8
    lexicographically-first hosts — the link-farm defense path the
    synthetic corpus (<= 4 hosts/doc) never exercises."""
    import itertools

    from osm_history_splitter_spark.text_queries import (
        COCITE_CAP,
        _ordered_pairs_expr,
    )

    hosts = [f"h{i:02d}" for i in reversed(range(12))]
    df = spark.createDataFrame([(hosts,)], "raw array<string>")
    out = (
        df.select(
            F.slice(F.array_sort("raw"), 1, COCITE_CAP).alias("capped")
        )
        .select(F.explode(_ordered_pairs_expr()).alias("p"))
        .select("p.h1", "p.h2")
    )
    got = {(r["h1"], r["h2"]) for r in out.collect()}
    want = set(itertools.combinations(sorted(hosts)[:COCITE_CAP], 2))
    assert got == want and len(got) == 28


def test_token_quantiles_match_sorted_reference(spark, testdata_sf):
    """Exact lower-discrete quantiles: histogram-selection must equal
    the sort-everything definition v[ceil(q*n)-1] per lang."""
    import math

    from osm_history_splitter_spark.text_queries import (
        QUANTILES_PM,
        q_token_quantiles,
    )

    got = {r["lang"]: r for r in q_token_quantiles(spark, testdata_sf).collect()}
    d = spark.read.parquet(f"{testdata_sf}/documents.parquet")
    vals = {}
    for r in d.select("lang", F.size(F.split("text", " ")).alias("v")).collect():
        vals.setdefault(r["lang"], []).append(r["v"])
    assert set(got) == set(vals)
    for lang, vs in vals.items():
        vs.sort()
        assert got[lang]["n_docs"] == len(vs)
        for pm in QUANTILES_PM:
            want = vs[math.ceil(pm * len(vs) / 1000) - 1]
            assert got[lang][f"p{pm}"] == want, (lang, pm)


def test_sketch_states_merge_across_shards(spark, testdata_sf):
    """The 100-TB posture of both sketches is shard-parallel build +
    free merge: CMS states are ADDITIVE (sum per cell), HLL states are
    MAX-mergeable (per register). Split the corpus in two, build each
    half's state, merge — must equal the whole-corpus state exactly."""
    from osm_history_splitter_spark.text_queries import (
        cms_sketch,
        hll_registers,
    )

    d = spark.read.parquet(f"{testdata_sf}/documents.parquet")
    a, b = d.filter(F.col("doc_id") % 2 == 0), d.filter(F.col("doc_id") % 2 == 1)

    whole = {(r["i"], r["cell"]): r["n"] for r in cms_sketch(d).collect()}
    merged: dict = {}
    for half in (a, b):
        for r in cms_sketch(half).collect():
            merged[(r["i"], r["cell"])] = (
                merged.get((r["i"], r["cell"]), 0) + r["n"]
            )
    assert merged == whole

    whole_h = {
        (r["lang"], r["reg"]): r["m"] for r in hll_registers(d).collect()
    }
    merged_h: dict = {}
    for half in (a, b):
        for r in hll_registers(half).collect():
            k = (r["lang"], r["reg"])
            merged_h[k] = max(merged_h.get(k, 0), r["m"])
    assert merged_h == whole_h


from osm_history_splitter_spark.text_queries import (  # noqa: E402
    KMV_K,
    kmv_state,
    q_kmv_distinct,
)


def test_kmv_estimate_tracks_exact_distinct(spark, testdata_sf):
    """KMV with k=64 has ~12.5% standard error; assert every per-lang
    estimate lands within 35% of the exact distinct-token count, with
    small langs (< k distinct) EXACT by the degeneration rule."""
    out = {r["lang"]: r for r in q_kmv_distinct(spark, testdata_sf).collect()}
    d = spark.read.parquet(f"{testdata_sf}/documents.parquet")
    exact = {
        r["lang"]: r["n"]
        for r in d.select("lang", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("lang")
        .agg(F.countDistinct("w").alias("n"))
        .collect()
    }
    assert set(out) == set(exact)
    for lang, r in out.items():
        assert 0 < r["m_used"] <= KMV_K
        if exact[lang] < KMV_K:
            assert r["est_distinct"] == exact[lang]
        else:
            assert r["m_used"] == KMV_K
            lo, hi = exact[lang] * 0.65, exact[lang] * 1.35
            assert lo <= r["est_distinct"] <= hi, (lang, r, exact[lang])


def test_kmv_state_is_mergeable(spark, testdata_sf):
    """Shard-mergeability: the state of the UNION equals the bottom-k of
    the union of the shard states — the property that lets every
    partition sketch independently."""
    d = spark.read.parquet(f"{testdata_sf}/documents.parquet")
    a = d.filter(F.col("doc_id") % 2 == 0)
    b = d.filter(F.col("doc_id") % 2 == 1)

    def state(df):
        return {
            (r["lang"], r["h"]) for r in kmv_state(df).collect()
        }

    merged_input = state(a) | state(b)
    by_lang: dict = {}
    for lang, h in merged_input:
        by_lang.setdefault(lang, []).append(h)
    merged = {
        (lang, h)
        for lang, hs in by_lang.items()
        for h in sorted(hs)[:KMV_K]
    }
    assert state(d) == merged


def test_vocab_growth_curve_is_monotone_and_exact_at_the_end(spark, testdata_sf):
    """Heaps curve: nondecreasing in N, and the full-corpus rung equals
    the exact distinct-token count."""
    from osm_history_splitter_spark.text_queries import q_vocab_growth

    rows = sorted(
        (r["n_docs"], r["vocab"])
        for r in q_vocab_growth(spark, testdata_sf).collect()
    )
    assert len(rows) >= 2
    assert all(a[1] <= b[1] for a, b in zip(rows, rows[1:]))
    d = spark.read.parquet(f"{testdata_sf}/documents.parquet")
    n_docs = d.count()
    exact = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .select("w")
        .distinct()
        .count()
    )
    assert rows[-1] == (n_docs, exact)
    # the synthetic vocab is tiny (≈31 tokens) so the curve may saturate
    # by the first rung — only require it starts non-empty and bounded
    assert 0 < rows[0][1] <= exact
