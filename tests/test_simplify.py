"""Douglas–Peucker simplification (operators/simplify.py).

No SQL twin exists for DP (inherently sequential per line), so the
certification is property-based: known-answer fixtures, the ε-deviation
guarantee on random clouds, determinism/idempotence, and the int64
overflow fallback — plus the Spark applyInPandas wrapper against the
pure-Python kernel it wraps.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_history_splitter_spark.operators.simplify import (
    dp_simplify_py,
    simplify_lines,
    simplify_ways,
)


def _simplify(pts, eps):
    xs = np.array([p[0] for p in pts], dtype=np.int64)
    ys = np.array([p[1] for p in pts], dtype=np.int64)
    mask = dp_simplify_py(xs, ys, eps)
    return [p for p, k in zip(pts, mask) if k]


def test_straight_line_collapses():
    pts = [(0, 0), (10, 0), (20, 0), (30, 0)]
    assert _simplify(pts, 1) == [(0, 0), (30, 0)]


def test_wiggle_below_eps_drops_above_keeps():
    pts = [(0, 0), (50, 3), (100, 0)]
    assert _simplify(pts, 3) == [(0, 0), (100, 0)]  # ties DROP (strict >)
    assert _simplify(pts, 2) == pts


def test_classic_peak():
    # the peak (40 off the baseline) survives; its shoulders sit ~14.8
    # from the STEEP chords (not 1 from the baseline!) so eps must
    # exceed that to drop them
    pts = [(0, 0), (25, 1), (50, 40), (75, 1), (100, 0)]
    assert _simplify(pts, 15) == [(0, 0), (50, 40), (100, 0)]
    assert _simplify(pts, 14) == pts


def test_degenerate_closed_chord():
    # first == last: deviation = distance to the point itself
    pts = [(0, 0), (30, 0), (0, 0)]
    assert _simplify(pts, 29) == [(0, 0), (30, 0), (0, 0)]
    assert _simplify(pts, 30) == [(0, 0), (0, 0)]


def test_short_lines_pass_through():
    assert _simplify([(5, 5)], 10) == [(5, 5)]
    assert _simplify([(5, 5), (6, 6)], 10) == [(5, 5), (6, 6)]
    assert _simplify([], 10) == []


def _seg_dist(px, py, ax, ay, bx, by) -> float:
    dx, dy = bx - ax, by - ay
    if dx == 0 and dy == 0:
        return math.hypot(px - ax, py - ay)
    t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / (dx * dx + dy * dy)))
    return math.hypot(px - (ax + t * dx), py - (ay + t * dy))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_eps_guarantee_and_idempotence(seed):
    rng = np.random.default_rng(seed)
    n, eps = 200, 40
    xs = np.cumsum(rng.integers(-30, 31, n)).astype(np.int64)
    ys = np.cumsum(rng.integers(-30, 31, n)).astype(np.int64)
    mask = dp_simplify_py(xs, ys, eps)
    kept = np.nonzero(mask)[0]
    assert kept[0] == 0 and kept[-1] == n - 1
    # DP guarantee: every dropped point is within eps of the kept segment
    # spanning it
    for a, b in zip(kept[:-1], kept[1:]):
        for j in range(a + 1, b):
            assert (
                _seg_dist(xs[j], ys[j], xs[a], ys[a], xs[b], ys[b])
                <= eps + 1e-9
            )
    # idempotence: re-running on the kept chain changes nothing
    mask2 = dp_simplify_py(xs[kept], ys[kept], eps)
    assert mask2.all()


def test_overflow_fallback_exact():
    # coordinates big enough that cross² would wrap int64: the object-
    # dtype fallback must still decide exactly (cross ≈ 2e18 > 3e9 guard)
    big = 2_000_000_000
    pts = [(0, 0), (big, big - 1), (2 * big, 0)]
    # deviation of the middle point is ~1e9 >> eps → kept
    assert _simplify(pts, 1000) == pts


def test_overflow_gate_fires_before_multiply():
    # the adversarial case: true cross = 2^32·2^32 = 2^64 wraps int64 to
    # EXACTLY 0, so a post-multiply guard would drop a point deviating by
    # ~4e9 — the gate must decide from input magnitudes instead
    m = 2**32
    pts = [(0, 0), (1, m), (m, 0)]
    assert _simplify(pts, 10) == pts
    # same for the degenerate-chord branch: d² = 2·(2^33)² wraps
    pts2 = [(0, 0), (2**33, 2**33), (0, 0)]
    assert _simplify(pts2, 10) == pts2


def test_spark_wrapper_matches_kernel(spark):
    rng = np.random.default_rng(42)
    rows = []
    for line in range(20):
        n = int(rng.integers(2, 60))
        xs = np.cumsum(rng.integers(-50, 51, n))
        ys = np.cumsum(rng.integers(-50, 51, n))
        rows += [
            (line, s, int(x), int(y)) for s, (x, y) in enumerate(zip(xs, ys))
        ]
    df = spark.createDataFrame(rows, "line_id long, seq long, x long, y long")
    got = {
        (r.line_id, r.seq)
        for r in simplify_lines(df, 60).collect()
    }
    want = set()
    for line in range(20):
        pts = sorted((r for r in rows if r[0] == line), key=lambda r: r[1])
        xs = np.array([p[2] for p in pts], dtype=np.int64)
        ys = np.array([p[3] for p in pts], dtype=np.int64)
        for p, k in zip(pts, dp_simplify_py(xs, ys, 60)):
            if k:
                want.add((p[0], p[1]))
    assert got == want


def test_simplify_lines_validates_columns(spark):
    df = spark.createDataFrame([(1, 0, 0)], "line_id long, seq long, x long")
    with pytest.raises(ValueError):
        simplify_lines(df, 5)


def test_simplify_ways_projects_refs(spark):
    # way 7: straight east-west chain of 4 nodes → endpoints survive;
    # way 8: right-angle bend → all three survive. Latest node version
    # wins: node 2's v1 sits far off the line, v2 moved it back onto it —
    # only the v2 position makes way 7 collapse to its endpoints.
    nodes = spark.createDataFrame(
        [
            (1, 1, 0.00, 0.00),
            (2, 1, 0.10, 0.50),
            (2, 2, 0.10, 0.00),
            (3, 1, 0.20, 0.00),
            (4, 1, 0.30, 0.00),
            (5, 1, 1.00, 0.00),
            (6, 1, 1.00, 1.00),
            (7, 1, 2.00, 1.00),
        ],
        "id long, version int, lon double, lat double",
    )
    ways = spark.createDataFrame(
        [(7, 1, [1, 2, 3, 4]), (8, 1, [5, 6, 7])],
        "id long, version int, refs array<long>",
    )
    got = sorted(
        (r.id, r.seq, r.ref)
        for r in simplify_ways(nodes, ways, eps=2).collect()
    )
    assert got == [
        (7, 0, 1),
        (7, 3, 4),
        (8, 0, 5),
        (8, 1, 6),
        (8, 2, 7),
    ]


# ---------------------------------------------------------------------------
# hypothesis differential: iterative int64 kernel vs an independent
# recursive big-int reference (different control flow, pure Python ints)

from hypothesis import given, settings
from hypothesis import strategies as st


def _dp_recursive_ref(pts, eps):
    """Clean-room recursive DP with unbounded Python ints."""
    n = len(pts)
    if n == 0:
        return []
    keep = [False] * n
    keep[0] = keep[-1] = True

    def rec(lo, hi):
        if hi - lo < 2:
            return
        x1, y1 = pts[lo]
        x2, y2 = pts[hi]
        dx, dy = x2 - x1, y2 - y1
        best_j, best_num = -1, -1
        for j in range(lo + 1, hi):
            x, y = pts[j]
            if dx == 0 and dy == 0:
                num = (x - x1) ** 2 + (y - y1) ** 2
            else:
                num = (dx * (y - y1) - dy * (x - x1)) ** 2
            # strictly-greater argmax at the LOWEST index, like the kernel
            if num > best_num:
                best_j, best_num = j, num
        den = 1 if (dx == 0 and dy == 0) else dx * dx + dy * dy
        if best_num > eps * eps * den:
            keep[best_j] = True
            rec(lo, best_j)
            rec(best_j, hi)

    rec(0, n - 1)
    return keep


@settings(max_examples=300, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(-20000, 20000), st.integers(-20000, 20000)
        ),
        min_size=0,
        max_size=40,
    ),
    eps=st.integers(0, 500),
)
def test_kernel_matches_recursive_reference(pts, eps):
    xs = np.array([p[0] for p in pts], dtype=np.int64)
    ys = np.array([p[1] for p in pts], dtype=np.int64)
    got = list(dp_simplify_py(xs, ys, eps))
    assert got == _dp_recursive_ref(pts, eps)
