"""Mann-Kendall trend per cell (operators/raster.py:mann_kendall_trend).

Differential strategy like test_morans/test_getis: the in-row
higher-order-function implementation must equal a pure-Python reference
bit-for-bit on random integer series (including heavy ties), and the
sign contract must come out right on analytic rising/falling shapes.
Oracle twin parity (`mk_trend`) runs in tests/test_driver_excluded.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from osm_history_splitter_spark.operators.raster import mann_kendall_trend


def _ref(values: list[int]) -> tuple[int, int, int]:
    """(n, S, var_s_18) straight from the textbook definition."""
    n = len(values)
    s = sum(
        (0 < values[j] - values[i]) - (values[j] - values[i] < 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    tie = 0
    for v in set(values):
        t = values.count(v)
        tie += t * (t - 1) * (2 * t + 5)
    return n, s, n * (n - 1) * (2 * n + 5) - tie


def _run(spark, series: dict[int, list[tuple[int, int]]]):
    rows = [
        (cell, p, v) for cell, ser in series.items() for p, v in ser
    ]
    df = spark.createDataFrame(rows, "cell long, period long, v long")
    return {
        r.cell: (r.n_periods, r.s_stat, r.var_s_18)
        for r in mann_kendall_trend(df).collect()
    }


@pytest.mark.parametrize("seed,ncells,maxlen,vmax", [(1, 40, 25, 50), (2, 60, 12, 3)])
def test_matches_reference_on_random_series(spark, seed, ncells, maxlen, vmax):
    rng = np.random.default_rng(seed)
    series = {}
    for cell in range(ncells):
        n = int(rng.integers(1, maxlen + 1))
        periods = rng.choice(10 * maxlen, size=n, replace=False)
        series[cell] = [
            (int(p), int(rng.integers(0, vmax + 1))) for p in periods
        ]
    got = _run(spark, series)
    assert set(got) == set(series)
    for cell, ser in series.items():
        vals = [v for _, v in sorted(ser)]
        assert got[cell] == _ref(vals), f"cell {cell}: {vals}"


def test_analytic_shapes(spark):
    got = _run(
        spark,
        {
            1: [(p, p * 2) for p in range(10)],  # strictly rising
            2: [(p, 100 - p) for p in range(10)],  # strictly falling
            3: [(p, 7) for p in range(6)],  # constant: S=0 AND var=0
            4: [(0, 1)],  # single period
        },
    )
    assert got[1] == (10, 45, 10 * 9 * 25)
    assert got[2] == (10, -45, 10 * 9 * 25)
    assert got[3] == (6, 0, 0)
    assert got[4] == (1, 0, 0)


def test_period_order_not_input_order(spark):
    # rows arrive shuffled; the sort key is the period, not arrival
    ser = [(3, 9), (0, 1), (2, 4), (1, 2)]  # by period: 1,2,4,9 rising
    got = _run(spark, {1: ser})
    assert got[1] == (4, 6, 4 * 3 * 13)


def test_plan_stays_in_row(spark):
    df = spark.createDataFrame(
        [(1, 0, 1), (1, 1, 2)], "cell long, period long, v long"
    )
    plan = (
        mann_kendall_trend(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one groupBy(cell) agg; no self-join, no Python evaluation
    assert "Join" not in plan
    assert "EvalPython" not in plan
