"""Trajectory dwell + co-location (operators/trajectory.py).

Differential strategy: both operators must equal an O(n²)/sequential
pure-Python reference on random walks — for co-location that certifies
the τ-bucket ±1 replication is complete (no pair within τ missed) AND
exactly-once (replicas occupy distinct buckets, so no double count
without a distinct). Oracle twins (`dwell_segments`, `colocation`) run
in tests/test_driver_excluded.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from osm_history_splitter_spark.operators.trajectory import (
    colocation_pairs,
    dwell_segments,
)


def _walk(spark, n_users: int, n_events: int, n_cells: int, tmax: int, seed: int):
    rng = np.random.default_rng(seed)
    rows = []
    for e in range(n_events):
        rows.append(
            (
                int(rng.integers(0, n_users)),
                e,
                int(rng.integers(0, tmax)),
                int(rng.integers(0, n_cells)),
            )
        )
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, tse long, cell long"
    )
    return rows, df


def _brute_dwells(rows, min_events):
    out = []
    by_user: dict = {}
    for u, e, t, c in rows:
        by_user.setdefault(u, []).append((t, e, c))
    for u, evs in by_user.items():
        evs.sort()
        run = []
        for t, e, c in evs + [(None, None, object())]:
            if run and c != run[-1][2]:
                if len(run) >= min_events:
                    out.append(
                        (
                            u,
                            run[0][2],
                            min(r[0] for r in run),
                            max(r[0] for r in run),
                            len(run),
                        )
                    )
                run = []
            if t is not None:
                run.append((t, e, c))
    return sorted(out)


def _brute_coloc(rows, tau):
    agg: dict = {}
    for ua, ea, ta, ca in rows:
        for ub, eb, tb, cb in rows:
            if ua < ub and ca == cb and abs(ta - tb) <= tau:
                k = (ua, ub)
                n, g = agg.get(k, (0, None))
                gap = abs(ta - tb)
                agg[k] = (n + 1, gap if g is None else min(g, gap))
    return {k: v for k, v in agg.items()}


@pytest.mark.parametrize("seed,nu,ne,nc,tmax", [(1, 5, 300, 4, 5000), (2, 12, 500, 20, 100000)])
def test_dwells_match_reference(spark, seed, nu, ne, nc, tmax):
    rows, df = _walk(spark, nu, ne, nc, tmax, seed)
    got = sorted(
        (r.user_id, r.cell, r.enter_ts, r.exit_ts, r.n_events)
        for r in dwell_segments(df, min_events=2).collect()
    )
    assert got == _brute_dwells(rows, 2)


@pytest.mark.parametrize("seed,nu,ne,nc,tmax,tau", [
    (3, 6, 250, 3, 10000, 1000),
    (4, 10, 400, 8, 50000, 7)])
def test_colocation_matches_reference(spark, seed, nu, ne, nc, tmax, tau):
    rows, df = _walk(spark, nu, ne, nc, tmax, seed)
    got = {
        (r.user_a, r.user_b): (r.n_meetings, r.min_gap)
        for r in colocation_pairs(df, tau).collect()
    }
    assert got == _brute_coloc(rows, tau)


def test_colocation_boundary_gaps(spark):
    # |dt| == tau is IN (closed); tau+1 is OUT; bucket-boundary pairs
    # (adjacent buckets) must be found via the ±1 replication
    tau = 100
    rows = [
        (1, 0, 199, 7),  # bucket 1
        (2, 1, 299, 7),  # bucket 2, dt=100 == tau -> in
        (3, 2, 300, 7),  # dt from e0 = 101 -> out vs user 1
        (1, 3, 5000, 9),
        (2, 4, 5000, 9),  # same bucket, dt=0
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, tse long, cell long"
    )
    got = {
        (r.user_a, r.user_b): (r.n_meetings, r.min_gap)
        for r in colocation_pairs(df, tau).collect()
    }
    assert got == {(1, 2): (2, 0), (2, 3): (1, 1)}


def test_same_user_never_pairs(spark):
    rows = [(1, 0, 10, 5), (1, 1, 11, 5), (1, 2, 12, 5)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, tse long, cell long"
    )
    assert colocation_pairs(df, 100).count() == 0


def test_dwell_single_event_runs_drop_by_default(spark):
    rows = [(1, 0, 10, 5), (1, 1, 20, 6), (1, 2, 30, 6)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, tse long, cell long"
    )
    got = [
        (r.user_id, r.cell, r.enter_ts, r.exit_ts, r.n_events)
        for r in dwell_segments(df).collect()
    ]
    assert got == [(1, 6, 20, 30, 2)]
    # min_events=1 keeps the singleton
    assert dwell_segments(df, min_events=1).count() == 2


def test_plans(spark):
    _, df = _walk(spark, 3, 50, 3, 1000, 9)
    p1 = dwell_segments(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in p1 and "EvalPython" not in p1
    p2 = colocation_pairs(df, 50)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p2
    assert "BroadcastNestedLoopJoin" not in p2
    assert "EvalPython" not in p2


def test_validation(spark):
    _, df = _walk(spark, 2, 5, 2, 100, 0)
    with pytest.raises(ValueError):
        dwell_segments(df, min_events=0)
    with pytest.raises(ValueError):
        colocation_pairs(df, 0)


from osm_history_splitter_spark.operators.trajectory import (  # noqa: E402
    trajectory_stats,
)


def _brute_stats(rows):
    by_user: dict = {}
    for u, e, t, x, y in rows:
        by_user.setdefault(u, []).append((t, e, x, y))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        steps = [
            (b[2] - a[2]) ** 2 + (b[3] - a[3]) ** 2
            for a, b in zip(evs, evs[1:])
        ]
        out[u] = (
            len(evs),
            evs[-1][0] - evs[0][0],
            sum(steps),
            max(steps) if steps else 0,
            (evs[-1][2] - evs[0][2]) ** 2 + (evs[-1][3] - evs[0][3]) ** 2,
        )
    return out


@pytest.mark.parametrize("seed,nu,ne", [(3, 6, 200), (4, 15, 500)])
def test_trajectory_stats_match_reference(spark, seed, nu, ne):
    rng = np.random.default_rng(seed)
    rows = [
        (
            int(rng.integers(0, nu)),
            e,
            int(rng.integers(0, 100000)),
            int(rng.integers(0, 3000)),
            int(rng.integers(0, 3000)),
        )
        for e in range(ne)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, tse long, xs long, ys long"
    )
    got = {
        r.user_id: (
            r.n_events, r.duration, r.sum_step2, r.max_step2, r.net_disp2
        )
        for r in trajectory_stats(df).collect()
    }
    assert got == _brute_stats(rows)


def test_trajectory_stats_single_event_user(spark):
    df = spark.createDataFrame(
        [(1, 0, 100, 5, 7)],
        "user_id long, event_id long, tse long, xs long, ys long",
    )
    [r] = trajectory_stats(df).collect()
    assert (r.n_events, r.duration, r.sum_step2, r.max_step2,
            r.net_disp2) == (1, 0, 0, 0, 0)
