"""Getis-Ord Gi*: pure-Python differential on random lattices + the
analytic hot/cold signs (a spike cell's neighborhood scores positive, a
hole scores negative) and the exact-integer contract
(z = g_num · sqrt((n-1)/g_den_sq))."""

from __future__ import annotations

import math
import random
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from osm_history_splitter_spark.functions.grid import CELL_SHIFT  # noqa: E402
from osm_history_splitter_spark.operators.raster import getis_ord_g  # noqa: E402

RES = 5
MX = (1 << (RES + 1)) - 1
MY = (1 << RES) - 1


def _py_getis(cells: dict[int, int], k: int) -> dict[int, tuple]:
    """Textbook reference: per occupied cell, the self-inclusive binary
    Chebyshev-k neighborhood sum over occupied cells, re-expressed in the
    operator's (w_i, g_num, g_den_sq) integer contract."""
    n = len(cells)
    s = sum(cells.values())
    q = sum(x * x for x in cells.values())
    out = {}
    for c in cells:
        ix, iy = c // CELL_SHIFT, c % CELL_SHIFT
        l_sum = 0
        w_i = 0
        for dx in range(-k, k + 1):
            for dy in range(-k, k + 1):
                nx, ny = ix + dx, iy + dy
                if not (0 <= nx <= MX and 0 <= ny <= MY):
                    continue
                nc = nx * CELL_SHIFT + ny
                if nc in cells:
                    w_i += 1
                    l_sum += cells[nc]
        out[c] = (
            w_i,
            n * l_sum - s * w_i,
            (n * q - s * s) * (n * w_i - w_i * w_i),
        )
    return out


def _run(spark, cells: dict[int, int], k: int = 1) -> dict[int, tuple]:
    df = spark.createDataFrame(
        [(c, x) for c, x in cells.items()], "cell long, n long"
    )
    return {
        r["cell"]: (r["w_i"], r["g_num"], r["g_den_sq"])
        for r in getis_ord_g(df, RES, k=k).collect()
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("k", [1, 2])
def test_random_lattice_matches_python(spark, seed, k):
    rng = random.Random(seed)
    cells = {
        ix * CELL_SHIFT + iy: rng.randint(1, 30)
        for ix in range(0, 20)
        for iy in range(0, 12)
        if rng.random() < 0.55
    }
    assert _run(spark, cells, k) == _py_getis(cells, k)


def test_spike_is_hot_hole_is_cold(spark):
    """A flat 8×8 block with one spiked cell and one near-zero hole: the
    spike's neighborhood must z-score positive, the hole's negative, and
    a far-away background cell must sit near zero — computed from the
    integer contract exactly as a consumer would."""
    cells = {
        ix * CELL_SHIFT + iy: 10
        for ix in range(8)
        for iy in range(8)
    }
    spike, hole, bg = 1 * CELL_SHIFT + 1, 6 * CELL_SHIFT + 6, 1 * CELL_SHIFT + 6
    cells[spike] = 500
    cells[hole] = 1
    got = _run(spark, cells)
    assert got == _py_getis(cells, 1)

    def z(c):
        w_i, g_num, g_den_sq = got[c]
        return g_num * math.sqrt((len(cells) - 1) / g_den_sq)

    assert z(spike) > 2.0
    assert z(hole) < 0.0
    assert abs(z(bg)) < abs(z(spike))


def test_constant_field_degenerates(spark):
    """x_i all equal → nQ - S² = 0 → g_den_sq = 0 everywhere (z
    undefined) — the operator reports the exact degenerate zeros
    instead of NaNs; g_num is 0 too (every neighborhood is exactly
    average)."""
    cells = {
        ix * CELL_SHIFT + iy: 7 for ix in range(4) for iy in range(4)
    }
    got = _run(spark, cells)
    assert set(got) == set(cells)
    assert all(g_num == 0 and g_den == 0 for _, g_num, g_den in got.values())


def test_neighborhood_swallows_raster(spark):
    """k large enough that every neighborhood is the whole raster:
    n·w_i - w_i² = 0 → g_den_sq = 0 (the statistic has no variance left
    to stand on) and g_num = 0 (each L_i = S, w_i = n) — exact zeros,
    not a division crash."""
    cells = {0: 3, CELL_SHIFT + 1: 9, 2 * CELL_SHIFT + 2: 4}
    got = _run(spark, cells, k=4)
    assert all(v == (3, 0, 0) for v in got.values())
