"""Ring-validity operator (segjoin.ring_self_intersections): fixtures,
brute differential, cell invariance, and the oracle-query wrapper."""

from __future__ import annotations

import random

import pytest

from osm_history_splitter_spark.operators.segjoin import (
    ring_self_intersections,
)

from .test_segjoin import _ref_intersects

SCHEMA = "gid long, seq long, nseg long, x1 long, y1 long, x2 long, y2 long"


def _ring_segs(gid, verts):
    """Closed-ring edges of a vertex list (closing edge included)."""
    n = len(verts)
    return [
        (
            gid,
            i,
            n,
            verts[i][0],
            verts[i][1],
            verts[(i + 1) % n][0],
            verts[(i + 1) % n][1],
        )
        for i in range(n)
    ]


def _run(spark, rows, cell=64):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        (r["gid"], r["seq_a"], r["seq_b"])
        for r in ring_self_intersections(df, cell).collect()
    }


def _brute(rows):
    by_gid: dict = {}
    for g, seq, nseg, x1, y1, x2, y2 in rows:
        by_gid.setdefault(g, []).append((seq, nseg, (x1, y1, x2, y2)))
    out = set()
    for g, segs in by_gid.items():
        for sa, na, a in segs:
            for sb, _nb, b in segs:
                if sb <= sa + 1 or (sa == 0 and sb == na - 1):
                    continue
                if _ref_intersects(a, b):
                    out.add((g, sa, sb))
    return out


def test_square_is_simple(spark):
    rows = _ring_segs(1, [(0, 0), (10, 0), (10, 10), (0, 10)])
    assert _run(spark, rows) == set()


def test_bowtie_crossing_detected(spark):
    # edges 0 and 2 cross properly at (5,5)
    rows = _ring_segs(7, [(0, 0), (10, 10), (10, 0), (0, 10)])
    assert _run(spark, rows) == {(7, 0, 2)}


def test_repeated_nonconsecutive_vertex_detected(spark):
    # (5,5) appears twice, non-consecutively: four edge pairs meet there,
    # two of them non-adjacent -> NOT simple (the OGC rule)
    rows = _ring_segs(3, [(0, 0), (10, 0), (5, 5), (10, 10), (0, 10), (5, 5)])
    got = _run(spark, rows)
    assert got == _brute(rows) and got  # non-empty and exact


def test_collinear_touch_detected(spark):
    # edge 2 ends ON the interior of edge 0 -> shares a point, pair (0,2)
    rows = _ring_segs(9, [(0, 0), (20, 0), (30, 10), (10, 0)])
    got = _run(spark, rows)
    assert (9, 0, 2) in got
    assert got == _brute(rows)


def test_adjacent_and_wrap_pairs_excluded(spark):
    # a triangle's three edges all share endpoints pairwise, every pair
    # adjacent (incl. the (0, nseg-1) wrap) -> simple
    rows = _ring_segs(5, [(0, 0), (10, 0), (5, 9)])
    assert _run(spark, rows) == set()


def test_two_vertex_degenerate_ring_is_simple(spark):
    # 2 vertices -> both edges adjacent both ways; no testable pair
    rows = _ring_segs(2, [(0, 0), (10, 0)])
    assert _run(spark, rows) == set()


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_differential(spark, seed):
    rng = random.Random(seed)
    rows = []
    for g in range(20):
        n = rng.randint(3, 8)
        verts = [
            (rng.randrange(0, 40), rng.randrange(0, 40)) for _ in range(n)
        ]
        rows += _ring_segs(g, verts)
    want = _brute(rows)
    assert _run(spark, rows, cell=16) == want
    # cell-size invariance: tiny and huge grids agree
    assert _run(spark, rows, cell=3) == want
    assert _run(spark, rows, cell=1000) == want


def test_ring_simple_query_has_both_classes(spark, testdata_sf):
    """The oracle query over the testdata must exercise BOTH outcomes
    (some simple rings, some self-intersecting) or it certifies nothing."""
    from osm_history_splitter_spark.oracle_queries import q_ring_simple

    out = q_ring_simple(spark, testdata_sf)
    counts = {
        r["is_simple"]: r["n"]
        for r in out.groupBy("is_simple").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert counts.get(True, 0) > 0 and counts.get(False, 0) > 0, counts
