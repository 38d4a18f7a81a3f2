"""segment_intersections: brute-force differential, the touch/collinear
edge cases, exactly-once emission, and cell-size invariance."""

from __future__ import annotations

import random

import pytest

from osm_history_splitter_spark.operators.segjoin import (
    segment_intersections,
    segment_self_intersections,
)


def _orient(p, q, r):
    return (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])


def _on_bbox(p, q, r):
    return (
        min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
        and min(p[1], q[1]) <= r[1] <= max(p[1], q[1])
    )


def _ref_intersects(a, b):
    a1, a2, b1, b2 = a[:2], a[2:], b[:2], b[2:]
    d1, d2 = _orient(b1, b2, a1), _orient(b1, b2, a2)
    d3, d4 = _orient(a1, a2, b1), _orient(a1, a2, b2)
    if ((d1 > 0) != (d2 > 0) and d1 != 0 and d2 != 0) and (
        (d3 > 0) != (d4 > 0) and d3 != 0 and d4 != 0
    ):
        return True
    return (
        (d1 == 0 and _on_bbox(b1, b2, a1))
        or (d2 == 0 and _on_bbox(b1, b2, a2))
        or (d3 == 0 and _on_bbox(a1, a2, b1))
        or (d4 == 0 and _on_bbox(a1, a2, b2))
    )


SCHEMA = "id long, x1 long, y1 long, x2 long, y2 long"


def _pairs(spark, a, b, cell):
    adf = spark.createDataFrame(a, SCHEMA)
    bdf = spark.createDataFrame(b, SCHEMA)
    return {
        (r["id_a"], r["id_b"])
        for r in segment_intersections(adf, bdf, cell).collect()
    }


CASES = [
    # (a, b, intersect?)
    ((0, 0, 10, 10), (0, 10, 10, 0), True),  # proper X crossing
    ((0, 0, 10, 0), (5, 0, 5, 8), True),  # T-touch on interior
    ((0, 0, 10, 0), (10, 0, 15, 7), True),  # endpoint touch
    ((0, 0, 10, 0), (5, 0, 15, 0), True),  # collinear overlap
    ((0, 0, 10, 0), (11, 0, 20, 0), False),  # collinear disjoint
    ((0, 0, 10, 0), (0, 1, 10, 1), False),  # parallel, offset
    ((0, 0, 2, 2), (100, 100, 104, 104), False),  # far apart
    ((3, 3, 3, 3), (0, 0, 9, 9), True),  # degenerate point ON segment
    ((3, 4, 3, 4), (0, 0, 9, 9), False),  # degenerate point off segment
]


@pytest.mark.parametrize("a,b,want", CASES)
def test_predicate_cases(spark, a, b, want):
    got = _pairs(spark, [(1, *a)], [(2, *b)], cell=4)
    assert (len(got) == 1) == want
    # reference predicate agrees with itself being the spec
    assert _ref_intersects(a, b) == want


def _random_segs(rng, n, base):
    out = []
    for i in range(n):
        x, y = rng.randrange(2000), rng.randrange(2000)
        dx, dy = rng.randrange(-300, 301), rng.randrange(-300, 301)
        out.append(
            (
                base + i,
                x,
                y,
                max(0, min(2300, x + dx)),
                max(0, min(2300, y + dy)),
            )
        )
    return out


@pytest.mark.parametrize("seed,cell", [(0, 256), (1, 301), (2, 64)])
def test_random_differential(spark, seed, cell):
    """Brute-force equality — including cells smaller than segments, so
    multi-cell candidates stress the canonical-cell dedup."""
    rng = random.Random(seed)
    a = _random_segs(rng, 60, 0)
    b = _random_segs(rng, 60, 1000)
    want = {
        (sa[0], sb[0])
        for sa in a
        for sb in b
        if _ref_intersects(sa[1:], sb[1:])
    }
    assert want, "vacuous fixture"
    assert _pairs(spark, a, b, cell) == want


def test_self_join_exactly_once(spark):
    rng = random.Random(7)
    segs = _random_segs(rng, 80, 0)
    want = {
        (sa[0], sb[0])
        for sa in segs
        for sb in segs
        if sa[0] < sb[0] and _ref_intersects(sa[1:], sb[1:])
    }
    df = spark.createDataFrame(segs, SCHEMA)
    got = [
        (r["id_a"], r["id_b"])
        for r in segment_self_intersections(df, 128).collect()
    ]
    assert len(got) == len(set(got)), "duplicate pair emitted"
    assert set(got) == want


def test_bad_cell_raises(spark):
    df = spark.createDataFrame([(1, 0, 0, 1, 1)], SCHEMA)
    with pytest.raises(ValueError):
        segment_intersections(df, df, 0)


def test_plan_shape(spark):
    """The candidate join is ONE hash equi-join on the cell key — never
    a CartesianProduct, never a nested-loop join."""
    a = spark.createDataFrame([(1, 0, 0, 10, 10)], SCHEMA)
    b = spark.createDataFrame([(2, 0, 10, 10, 0)], SCHEMA)
    plan = (
        segment_intersections(a, b, 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
