"""Differentials for the positional phrase-match and PMI-collocation
queries over controlled tiny corpora (written as documents.parquet so
the queries' (spark, sf_dir) contract is exercised end-to-end); the
DuckDB twins are certified at sf0.001 by tests/test_driver_excluded.py."""

from __future__ import annotations

from collections import Counter

import pytest

from osm_history_splitter_spark.text_queries import (
    PHRASE,
    PMI_TOP_K,
    q_phrase_match,
    q_pmi_bigrams,
)


def _write_docs(spark, tmp_path, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _py_phrase(texts, phrase):
    out = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        n = sum(
            1
            for j in range(len(toks) - len(phrase) + 1)
            if tuple(toks[j : j + len(phrase)]) == phrase
        )
        if n:
            out[i] = n
    return out


def test_phrase_match_differential(spark, tmp_path):
    p = " ".join(PHRASE)
    texts = [
        f"x {p} y {p}",          # two occurrences
        f"{p}",                   # exact-boundary occurrence
        f"{PHRASE[0]} {PHRASE[1]} z {PHRASE[2]}",  # broken chain: no match
        "unrelated words only",
        f"a {PHRASE[0]} {p} b",   # leading partial then a real match
    ]
    sf = _write_docs(spark, tmp_path, texts)
    got = {r.doc_id: r.n_occ for r in q_phrase_match(spark, sf).collect()}
    assert got == _py_phrase(texts, PHRASE)
    assert got[0] == 2 and 2 not in got and 3 not in got


def _py_pmi(texts, k):
    uni = Counter(w for t in texts for w in t.split(" ") if w)
    bi = Counter()
    for t in texts:
        toks = [w for w in t.split(" ")]
        if len(toks) < 2:
            continue
        for a, b in zip(toks, toks[1:]):
            if a and b:
                bi[(a, b)] += 1
    tot = sum(uni.values())
    rows = [
        (w1, w2, c12, (c12 * tot * 1000) // (uni[w1] * uni[w2]))
        for (w1, w2), c12 in bi.items()
    ]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:k]


def test_pmi_bigrams_differential(spark, tmp_path):
    texts = [
        "a b a b c",
        "c c c c",
        "a c b a",
        "b b a",
        "solo",
    ]
    sf = _write_docs(spark, tmp_path, texts)
    got = [
        (r.w1, r.w2, r.n12, r.lift_milli)
        for r in q_pmi_bigrams(spark, sf).collect()
    ]
    want = _py_pmi(texts, PMI_TOP_K)
    assert sorted(got) == sorted(want)
    # rare-but-always-together pair outranks frequent loose pairs
    lifts = {(w1, w2): lm for w1, w2, _, lm in got}
    assert lifts[("a", "b")] > lifts[("a", "c")]


def test_pmi_top_k_boundary_is_order_deterministic(spark, tmp_path):
    # > PMI_TOP_K distinct bigrams: the kept set must be exactly the
    # reference's first K under (lift desc, w1 asc, w2 asc)
    texts = [f"t{i} t{(i * 7 + 1) % 60}" for i in range(60)]
    sf = _write_docs(spark, tmp_path, texts)
    got = [
        (r.w1, r.w2, r.n12, r.lift_milli)
        for r in q_pmi_bigrams(spark, sf).collect()
    ]
    want = _py_pmi(texts, PMI_TOP_K)
    assert len(got) == PMI_TOP_K
    assert sorted(got) == sorted(want)
