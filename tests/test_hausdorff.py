"""Hausdorff trajectory-similarity join (operators/trajectory.py).

Differential strategy: the grid-join operator must equal an O(n²·m²)
pure-Python reference — "all unordered trajectory pairs with symmetric
Hausdorff distance ≤ radius, with the exact squared distance" — on
random point clouds. That certifies three things at once: the ×9 cell
replication is COMPLETE (no qualifying point pair missed, so the
per-point mins are true mins), the coverage gate is exact (a pair whose
true H exceeds the radius is dropped even when most of its points have
close partners), and the candidate join is exactly-once (no double
counting that could corrupt coverage counts). The oracle twin
(`hausdorff_pairs`) runs in tests/test_driver_excluded.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from osm_history_splitter_spark.operators.trajectory import hausdorff_join


def _clouds(spark, n_traj, n_pts, extent, seed):
    """Random trajectories; half share a cluster origin so some pairs
    land within the radius and others don't."""
    rng = np.random.default_rng(seed)
    rows = []
    for t in range(n_traj):
        ox = int(rng.integers(0, 3)) * extent * 3
        oy = int(rng.integers(0, 2)) * extent * 3
        for _ in range(int(rng.integers(1, n_pts + 1))):
            rows.append(
                (
                    t,
                    ox + int(rng.integers(0, extent)),
                    oy + int(rng.integers(0, extent)),
                )
            )
    df = spark.createDataFrame(rows, "tid long, xs long, ys long")
    return rows, df


def _brute(rows, radius):
    by_tid: dict = {}
    for t, x, y in rows:
        by_tid.setdefault(t, set()).add((x, y))
    out = {}
    tids = sorted(by_tid)
    for i, ta in enumerate(tids):
        for tb in tids[i + 1:]:
            h2 = 0
            for side_a, side_b in ((ta, tb), (tb, ta)):
                for ax, ay in by_tid[side_a]:
                    md = min(
                        (ax - bx) ** 2 + (ay - by) ** 2
                        for bx, by in by_tid[side_b]
                    )
                    h2 = max(h2, md)
            if h2 <= radius * radius:
                out[(ta, tb)] = h2
    return out


@pytest.mark.parametrize(
    "seed,n_traj,n_pts,extent,radius",
    [
        (1, 8, 25, 100, 160),   # cluster diagonal ≈ 141 < r: intra-cluster pairs qualify
        (2, 12, 40, 200, 90),   # r < extent: coverage gates bind mid-cluster
        (3, 6, 10, 50, 75),     # sparse, tiny trajectories (incl. 1-point)
    ],
)
def test_hausdorff_matches_brute(spark, seed, n_traj, n_pts, extent, radius):
    rows, df = _clouds(spark, n_traj, n_pts, extent, seed)
    got = {
        (r.tid_a, r.tid_b): r.h2
        for r in hausdorff_join(df, radius).collect()
    }
    want = _brute(rows, radius)
    assert got == want
    assert want, "vacuous fixture — no qualifying pair"


def test_hausdorff_duplicate_points_are_set_semantics(spark):
    # duplicated points must not inflate coverage counts
    rows = [(0, 0, 0), (0, 0, 0), (0, 10, 0), (1, 0, 3), (1, 10, 3)]
    df = spark.createDataFrame(rows, "tid long, xs long, ys long")
    got = {(r.tid_a, r.tid_b): r.h2 for r in hausdorff_join(df, 5).collect()}
    assert got == {(0, 1): 9}


def test_hausdorff_coverage_gate_drops_far_pair(spark):
    # one far outlier point in B pushes H beyond the radius: the pair
    # must vanish even though every A point has a close partner
    rows = [(0, 0, 0), (0, 10, 0), (1, 0, 1), (1, 10, 1), (1, 500, 500)]
    df = spark.createDataFrame(rows, "tid long, xs long, ys long")
    assert hausdorff_join(df, 20).count() == 0


def test_hausdorff_rejects_bad_radius(spark):
    df = spark.createDataFrame([(0, 1, 1)], "tid long, xs long, ys long")
    with pytest.raises(ValueError):
        hausdorff_join(df, 0)
