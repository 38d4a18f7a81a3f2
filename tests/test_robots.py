"""RFC 9309 robots evaluation (text_queries.apply_robots): longest-match
wins, Allow wins length ties, empty prefix is the blanket fallback, no
rule defaults to allow."""

from __future__ import annotations

from osm_history_splitter_spark.text_queries import apply_robots


def _run(spark, urls, rules):
    u = spark.createDataFrame(urls, "doc_id long, host string, path string")
    r = spark.createDataFrame(rules, "host string, prefix string, allow boolean")
    return {
        row["doc_id"]: (row["allowed"], row["rule_len"])
        for row in apply_robots(u, r).collect()
    }


def test_longest_match_and_tiebreaks(spark):
    rules = [
        ("h.test", "/b/", False),
        ("h.test", "/b/ok/", True),   # longer allow overrides the deny
        ("h.test", "", False),        # blanket deny, lowest priority
        ("h.test", "/a/", True),      # length tie vs next row
        ("h.test", "/a/", False),     # ... Allow wins the tie
        ("other.test", "/", False),
    ]
    urls = [
        (1, "h.test", "/b/x"),        # /b/ deny (len 3)
        (2, "h.test", "/b/ok/x"),     # /b/ok/ allow (len 6)
        (3, "h.test", "/c/x"),        # blanket deny (len 0)
        (4, "h.test", "/a/x"),        # tie → allow (len 3)
        (5, "nope.test", "/b/x"),     # no rules for host → default allow
        (6, "other.test", "/b/x"),    # host isolation: /-deny applies
    ]
    got = _run(spark, urls, rules)
    assert got == {
        1: (False, 3),
        2: (True, 6),
        3: (False, 0),
        4: (True, 3),
        5: (True, -1),
        6: (False, 1),
    }


def test_partial_segment_prefix_matches(spark):
    # REP prefixes are BYTE prefixes, not path segments: '/c' matches
    # '/cgi-bin/x' too
    got = _run(
        spark,
        [(1, "h.test", "/cgi-bin/x"), (2, "h.test", "/d")],
        [("h.test", "/c", False)],
    )
    assert got == {1: (False, 2), 2: (True, -1)}
