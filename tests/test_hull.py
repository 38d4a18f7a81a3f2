"""convex_hull: complete-spec property checks (containment + strict
convexity + vertices-from-input uniquely determine the hull),
repartition invariance, and the degenerate inputs."""

from __future__ import annotations

import random

import pytest

from osm_history_splitter_spark.operators.hull import convex_hull


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _check_is_hull(ring, points):
    """A strictly convex CCW polygon whose vertices are input points and
    which contains every input point IS the convex hull (unique)."""
    n = len(ring)
    coords = {(x, y) for _, x, y in points}
    assert all((x, y) in coords for _, x, y in ring)
    if n >= 3:
        for i in range(n):
            o, a, b = ring[i][1:], ring[(i + 1) % n][1:], ring[(i + 2) % n][1:]
            assert _cross(o, a, b) > 0, "not strictly convex CCW"
        for _, x, y in points:
            for i in range(n):
                o, a = ring[i][1:], ring[(i + 1) % n][1:]
                assert _cross(o, a, (x, y)) >= 0, f"({x},{y}) outside"
    # starts at the lexicographic minimum
    assert ring[0][1:] == min(v[1:] for v in ring)


def _run(spark, points, parts=5):
    df = spark.createDataFrame(points, "id long, xs long, ys long").repartition(
        parts
    )
    rows = convex_hull(df).collect()
    rows.sort(key=lambda r: r["pos"])
    assert [r["pos"] for r in rows] == list(range(len(rows)))
    return [(r["id"], r["xs"], r["ys"]) for r in rows]


def test_square_with_collinear_midpoints(spark):
    pts = [
        (1, 0, 0), (2, 10, 0), (3, 10, 10), (4, 0, 10),
        (5, 5, 0), (6, 10, 5), (7, 5, 5),  # edge midpoints + interior
    ]
    ring = _run(spark, pts)
    assert [(x, y) for _, x, y in ring] == [(0, 0), (10, 0), (10, 10), (0, 10)]


def test_degenerate_inputs(spark):
    assert _run(spark, [(9, 4, 4)]) == [(9, 4, 4)]
    assert _run(spark, [(1, 5, 5), (2, 1, 1)]) == [(2, 1, 1), (1, 5, 5)]
    # all collinear → the two extremes only
    ring = _run(spark, [(i, i * 2, i * 4) for i in range(8)])
    assert [(x, y) for _, x, y in ring] == [(0, 0), (14, 28)]


def test_duplicate_coordinate_min_id(spark):
    ring = _run(spark, [(7, 0, 0), (3, 0, 0), (5, 9, 0), (6, 0, 9)])
    assert ring[0] == (3, 0, 0)


@pytest.mark.parametrize("seed,parts", [(0, 1), (0, 7), (1, 4)])
def test_random_properties_and_partition_invariance(spark, seed, parts):
    rng = random.Random(seed)
    pts = [
        (i, rng.randrange(1000), rng.randrange(1000)) for i in range(300)
    ]
    ring = _run(spark, pts, parts)
    _check_is_hull(ring, pts)
    if parts != 1:
        assert ring == _run(spark, pts, 1), "partitioning changed the hull"
