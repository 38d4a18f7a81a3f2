"""ExactSubstr span dedup (operators/dedup.py:exact_substring_spans):
planted duplicate passages must come back as maximal merged spans, unique
text must not be flagged. The DuckDB twin is certified separately by
tests/test_driver_excluded.py (query ``exact_substr``)."""

from __future__ import annotations

import pytest

from osm_history_splitter_spark.operators.dedup import exact_substring_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _uniq(tag: str, n: int) -> str:
    return " ".join(f"{tag}{i}" for i in range(n))


def test_planted_cross_doc_passage(spark):
    shared = " ".join(f"dup{i}" for i in range(20))
    rows = [
        (1, _uniq("a", 15) + " " + shared + " " + _uniq("b", 10)),
        (2, shared + " " + _uniq("c", 30)),
        (3, _uniq("d", 40)),
    ]
    spans = {
        r.doc_id: (r.span_start, r.span_end, r.span_tokens)
        for r in exact_substring_spans(_docs(spark, rows), min_tokens=8).collect()
    }
    # doc 1: shared passage occupies tokens 16..35 (1-based)
    assert spans[1] == (16, 35, 20)
    # doc 2: tokens 1..20
    assert spans[2] == (1, 20, 20)
    # doc 3: clean
    assert 3 not in spans


def test_within_doc_repeat_is_flagged(spark):
    rep = " ".join(f"r{i}" for i in range(10))
    rows = [(1, rep + " " + _uniq("x", 12) + " " + rep)]
    got = exact_substring_spans(_docs(spark, rows), min_tokens=8).collect()
    spans = sorted((r.span_start, r.span_end) for r in got)
    assert spans == [(1, 10), (23, 32)]


def test_overlapping_grams_merge_to_one_span(spark):
    shared = " ".join(f"s{i}" for i in range(30))
    rows = [(1, shared), (2, shared)]
    got = exact_substring_spans(_docs(spark, rows), min_tokens=8).collect()
    assert len(got) == 2  # ONE maximal span per doc, not 23 gram-spans
    for r in got:
        assert (r.span_start, r.span_end, r.span_tokens) == (1, 30, 30)
        assert r.dup_grams == 23  # 30 - 8 + 1 grams merged into it


def test_short_docs_yield_no_grams(spark):
    rows = [(1, "only three tokens"), (2, "only three tokens")]
    assert exact_substring_spans(_docs(spark, rows), min_tokens=8).count() == 0


def test_min_tokens_guard():
    with pytest.raises(ValueError):
        exact_substring_spans(None, min_tokens=1)
