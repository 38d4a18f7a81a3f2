"""Rectangle-extent overlap join (operators/extents.py).

Property strategy mirrors the ε-join/segment-join suites: the grid
filter-and-refine join must equal the O(n²) brute force on random
integer rectangle sets — completeness (no overlapping pair missed by the
cell decomposition) AND exactly-once emission (no distinct hides a
double count from multi-cell pairs). Oracle twin parity runs in
tests/test_driver_excluded.py (``rect_overlap``); these pin the operator
itself plus the plan shape.
"""

from __future__ import annotations

import numpy as np
import pytest

from osm_history_splitter_spark.operators.extents import rect_overlap_join

W, H = 36000, 18000


def _rects(spark, n: int, seed: int, max_edge: int):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        x0 = int(rng.integers(0, W - max_edge))
        y0 = int(rng.integers(0, H - max_edge))
        rows.append(
            (
                i,
                x0,
                y0,
                x0 + int(rng.integers(1, max_edge)),
                y0 + int(rng.integers(1, max_edge)),
            )
        )
    return rows, spark.createDataFrame(
        rows, "id long, x0 long, y0 long, x1 long, y1 long"
    )


def _brute(ra, rb):
    out = {}
    for ia, ax0, ay0, ax1, ay1 in ra:
        for ib, bx0, by0, bx1, by1 in rb:
            ix0, iy0 = max(ax0, bx0), max(ay0, by0)
            ix1, iy1 = min(ax1, bx1), min(ay1, by1)
            if ix0 <= ix1 and iy0 <= iy1:
                out[(ia, ib)] = (
                    ix0,
                    iy0,
                    ix1,
                    iy1,
                    (ix1 - ix0) * (iy1 - iy0),
                )
    return out


@pytest.mark.parametrize(
    "seed,na,nb,edge,cell",
    [(1, 200, 150, 1200, 700), (2, 400, 60, 3000, 500), (3, 50, 50, 300, 4000)],
)
def test_overlap_matches_brute_force(spark, seed, na, nb, edge, cell):
    ra, dfa = _rects(spark, na, seed, edge)
    rb, dfb = _rects(spark, nb, seed + 100, edge)
    got = rect_overlap_join(dfa, dfb, cell).collect()
    got_map = {
        (r.id_a, r.id_b): (r.ix0, r.iy0, r.ix1, r.iy1, r.inter_area)
        for r in got
    }
    assert len(got) == len(got_map), "pair emitted more than once"
    assert got_map == _brute(ra, rb)


def test_edge_and_corner_touch_are_closed_overlaps(spark):
    # b shares only the right edge of a; c only the corner; d is disjoint
    dfa = spark.createDataFrame(
        [(1, 100, 100, 200, 200)], "id long, x0 long, y0 long, x1 long, y1 long"
    )
    dfb = spark.createDataFrame(
        [
            (10, 200, 100, 300, 200),  # edge touch -> area 0
            (11, 200, 200, 300, 300),  # corner touch -> area 0
            (12, 201, 100, 300, 200),  # disjoint by 1
        ],
        "id long, x0 long, y0 long, x1 long, y1 long",
    )
    got = {
        (r.id_a, r.id_b): r.inter_area
        for r in rect_overlap_join(dfa, dfb, 50).collect()
    }
    assert got == {(1, 10): 0, (1, 11): 0}


def test_multi_cell_pair_emitted_once(spark):
    # both rects span many cells; intersection spans several cells too
    dfa = spark.createDataFrame(
        [(1, 0, 0, 1000, 1000)], "id long, x0 long, y0 long, x1 long, y1 long"
    )
    dfb = spark.createDataFrame(
        [(2, 500, 500, 1500, 1500)], "id long, x0 long, y0 long, x1 long, y1 long"
    )
    got = rect_overlap_join(dfa, dfb, 100).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.ix0, r.iy0, r.ix1, r.iy1, r.inter_area) == (
        500,
        500,
        1000,
        1000,
        250000,
    )


def test_plan_no_cartesian_no_distinct(spark):
    _, dfa = _rects(spark, 30, 7, 500)
    _, dfb = _rects(spark, 30, 8, 500)
    plan = (
        rect_overlap_join(dfa, dfb, 400)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" not in plan  # no distinct smuggled in


def test_rejects_bad_cell(spark):
    _, dfa = _rects(spark, 3, 0, 100)
    with pytest.raises(ValueError):
        rect_overlap_join(dfa, dfa, 0)
