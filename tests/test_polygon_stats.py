"""way_ring_stats: integer shoelace area/centroid vs a pure-Python
reference, sign conventions, implicit closure, and the dropped-vertex
rule."""

from __future__ import annotations

import random

import pytest

from osm_history_splitter_spark.operators.polygon_stats import way_ring_stats


def _ref_stats(coords):
    """Pure-Python shoelace on exact ints: (area2, cx_num, cy_num)."""
    n = len(coords)
    a2 = cx = cy = 0
    for i in range(n):
        x, y = coords[i]
        xn, yn = coords[(i + 1) % n]
        c = x * yn - xn * y
        a2 += c
        cx += (x + xn) * c
        cy += (y + yn) * c
    return a2, cx, cy


def _run(spark, ways, nodes):
    wdf = spark.createDataFrame(ways, "id long, refs array<long>")
    ndf = spark.createDataFrame(nodes, "id long, xs long, ys long")
    rows = way_ring_stats(wdf, ndf).collect()
    return {
        r["id"]: (r["nvert"], r["area2"], r["cx_num"], r["cy_num"])
        for r in rows
    }


SQUARE = [(1, 0, 0), (2, 10, 0), (3, 10, 10), (4, 0, 10)]


def test_square_ccw(spark):
    out = _run(spark, [(100, [1, 2, 3, 4])], SQUARE)
    # area 100 → area2 = 200; centroid (5,5) → num = 3 · area2 · 5
    assert out[100] == (4, 200, 3000, 3000)


def test_square_cw_negative(spark):
    out = _run(spark, [(100, [4, 3, 2, 1])], SQUARE)
    assert out[100] == (4, -200, -3000, -3000)


def test_explicit_closure_same_sums(spark):
    """A way closed by repeating its first ref gets a degenerate wrap
    edge — same area/centroid sums, one more vertex."""
    open_ = _run(spark, [(1, [1, 2, 3, 4])], SQUARE)
    closed = _run(spark, [(1, [1, 2, 3, 4, 1])], SQUARE)
    assert open_[1][1:] == closed[1][1:]
    assert closed[1][0] == 5


def test_missing_node_drops_way(spark):
    out = _run(spark, [(1, [1, 2, 99]), (2, [1, 2, 3])], SQUARE)
    assert 1 not in out and 2 in out


def test_degenerate_small_ways(spark):
    out = _run(spark, [(1, [1]), (2, [1, 2])], SQUARE)
    # <3 vertices: zero area, zero numerators — kept, not dropped
    assert out[1] == (1, 0, 0, 0)
    assert out[2] == (2, 0, 0, 0)


def test_duplicate_refs_multiplicity(spark):
    """A ref appearing twice contributes two vertices (bow-tie)."""
    coords = [(1, 0, 0), (2, 4, 0), (3, 4, 4), (4, 0, 4)]
    refs = [1, 2, 3, 1, 4]  # pinched ring through vertex 1
    want = _ref_stats([(0, 0), (4, 0), (4, 4), (0, 0), (0, 4)])
    out = _run(spark, [(9, refs)], coords)
    assert out[9] == (5,) + want


@pytest.mark.parametrize("seed", [0, 1])
def test_random_differential(spark, seed):
    rng = random.Random(seed)
    nodes = [(i, rng.randrange(36000), rng.randrange(18000)) for i in range(60)]
    ways = [
        (w, [rng.randrange(60) for _ in range(rng.randrange(3, 12))])
        for w in range(25)
    ]
    by_id = {i: (x, y) for i, x, y in nodes}
    out = _run(spark, ways, nodes)
    assert set(out) == {w for w, _ in ways}
    for w, refs in ways:
        want = _ref_stats([by_id[r] for r in refs])
        assert out[w] == (len(refs),) + want, w


def test_plan_shape(spark):
    """No cross join anywhere, and the groupBy reuses the window's hash
    partitioning: exactly ONE id-keyed Exchange in the whole plan (the
    ref-keyed exchanges of the coordinate join are intrinsic)."""
    import re

    wdf = spark.createDataFrame([(1, [1, 2, 3])], "id long, refs array<long>")
    ndf = spark.createDataFrame(SQUARE, "id long, xs long, ys long")
    plan = (
        way_ring_stats(wdf, ndf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"hashpartitioning\(id#", plan)) == 1
