"""Moran's I: pure-Python differential on random lattices + the classic
analytic signs (checkerboard counts → negative I; smooth gradient →
positive I) and the exact-integer contract (I = i_num / i_den)."""

from __future__ import annotations

import random
import sys
from fractions import Fraction
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from osm_history_splitter_spark.functions.grid import CELL_SHIFT  # noqa: E402
from osm_history_splitter_spark.operators.raster import morans_i  # noqa: E402

RES = 5
MX = (1 << (RES + 1)) - 1
MY = (1 << RES) - 1


def _py_morans(cells: dict[int, int], k: int):
    """Textbook reference: Fraction arithmetic over ordered pairs of
    occupied cells with binary Chebyshev-k weights, then re-expressed in
    the operator's (n_cells, w_sum, i_num, i_den) integer contract."""
    n = len(cells)
    s = sum(cells.values())
    d = {c: n * x - s for c, x in cells.items()}  # n²·(x - x̄)
    w_sum = 0
    num_core = 0
    for c, dc in d.items():
        ix, iy = c // CELL_SHIFT, c % CELL_SHIFT
        for dx in range(-k, k + 1):
            for dy in range(-k, k + 1):
                if dx == 0 and dy == 0:
                    continue
                nx, ny = ix + dx, iy + dy
                if not (0 <= nx <= MX and 0 <= ny <= MY):
                    continue
                nc = nx * CELL_SHIFT + ny
                if nc in d:
                    w_sum += 1
                    num_core += dc * d[nc]
    den_core = sum(v * v for v in d.values())
    return n, w_sum, n * num_core, w_sum * den_core


def _run(spark, cells: dict[int, int], k: int = 1):
    df = spark.createDataFrame(
        [(c, x) for c, x in cells.items()], "cell long, n long"
    )
    [row] = morans_i(df, RES, k=k).collect()
    return row["n_cells"], row["w_sum"], row["i_num"], row["i_den"]


def _grid(pred, val) -> dict[int, int]:
    return {
        ix * CELL_SHIFT + iy: val(ix, iy)
        for ix in range(MX + 1)
        for iy in range(MY + 1)
        if pred(ix, iy)
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
    assert _run(spark, cells, k) == _py_morans(cells, k)


def test_checkerboard_is_negative(spark):
    """Alternating high/low counts on a full block: the textbook maximal
    dispersion case — I must come out negative (and exactly match the
    reference)."""
    cells = _grid(
        lambda ix, iy: ix < 16 and iy < 16,
        lambda ix, iy: 10 if (ix + iy) % 2 == 0 else 1,
    )
    got = _run(spark, cells)
    assert got == _py_morans(cells, 1)
    n, w, i_num, i_den = got
    assert i_den > 0 and Fraction(i_num, i_den) < 0


def test_gradient_is_positive(spark):
    """Smoothly increasing counts: neighbors resemble each other — I
    must be strongly positive."""
    cells = _grid(lambda ix, iy: ix < 16 and iy < 16, lambda ix, iy: ix + 1)
    n, w, i_num, i_den = _run(spark, cells)
    assert i_den > 0 and Fraction(i_num, i_den) > Fraction(1, 2)


def test_constant_field_degenerates(spark):
    """x_i all equal → every deviation is 0 → i_num = i_den = 0 (Moran's
    I undefined, 0/0) — the operator reports the exact degenerate pair
    instead of a NaN."""
    cells = _grid(lambda ix, iy: ix < 4 and iy < 4, lambda ix, iy: 7)
    n, w, i_num, i_den = _run(spark, cells)
    assert (n, w) == (16, 84) and i_num == 0 and i_den == 0


def test_isolated_cells_no_pairs(spark):
    """Occupied cells farther than k apart: W = 0 → i_num = 0 (no pair
    evidence) and i_den = 0 by the W factor — degenerate, not a crash."""
    cells = {0 * CELL_SHIFT + 0: 3, 10 * CELL_SHIFT + 10: 9}
    n, w, i_num, i_den = _run(spark, cells)
    assert (n, w, i_num, i_den) == (2, 0, 0, 0)
