"""Raster morphology: numpy differential on random grids + the subset/
superset lattice laws (dilate ⊇ base ⊇ erode; closing ⊇ base ⊇ opening)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from osm_history_splitter_spark.functions.grid import CELL_SHIFT  # noqa: E402
from osm_history_splitter_spark.operators.raster import (  # noqa: E402
    closing,
    dilate,
    erode,
    opening,
)

RES = 5
MX = (1 << (RES + 1)) - 1
MY = (1 << RES) - 1


def _np_morph(cells: set[int], k: int, mode: str) -> set[int]:
    """Dense-grid reference: zero-padded Chebyshev-k dilation/erosion."""
    out = set()
    if mode == "dilate":
        for c in cells:
            ix, iy = c // CELL_SHIFT, c % CELL_SHIFT
            for dx in range(-k, k + 1):
                for dy in range(-k, k + 1):
                    nx, ny = ix + dx, iy + dy
                    if 0 <= nx <= MX and 0 <= ny <= MY:
                        out.add(nx * CELL_SHIFT + ny)
        return out
    for c in cells:
        ix, iy = c // CELL_SHIFT, c % CELL_SHIFT
        ok = True
        for dx in range(-k, k + 1):
            for dy in range(-k, k + 1):
                nx, ny = ix + dx, iy + dy
                if not (0 <= nx <= MX and 0 <= ny <= MY):
                    ok = False  # clipped neighborhood: zero padding
                elif nx * CELL_SHIFT + ny not in cells:
                    ok = False
        if ok:
            out.add(c)
    return out


@pytest.fixture(scope="module")
def base_cells():
    """Full-domain cells INCLUDING border rows/columns — the differential
    test must exercise the zero-padding clip paths."""
    rng = np.random.default_rng(3)
    ix = rng.integers(0, MX + 1, 300)
    iy = rng.integers(0, MY + 1, 300)
    return set((ix * CELL_SHIFT + iy).tolist())


@pytest.fixture(scope="module")
def interior_cells():
    """Cells with Chebyshev margin >= 1 from the domain border — the
    closing-extensivity law only holds away from the zero-padded border
    (see operators/raster.py:closing)."""
    rng = np.random.default_rng(5)
    ix = rng.integers(1, MX, 300)
    iy = rng.integers(1, MY, 300)
    return set((ix * CELL_SHIFT + iy).tolist())


def _df(spark, cells):
    return spark.createDataFrame([(int(c),) for c in sorted(cells)], "cell long")


@pytest.mark.parametrize("k", [1, 2])
def test_dilate_erode_match_reference(spark, base_cells, k):
    base = _df(spark, base_cells)
    got_d = {r["cell"] for r in dilate(base, RES, k).collect()}
    got_e = {r["cell"] for r in erode(base, RES, k).collect()}
    assert got_d == _np_morph(base_cells, k, "dilate")
    assert got_e == _np_morph(base_cells, k, "erode")
    # lattice laws
    assert base_cells <= got_d
    assert got_e <= base_cells


def test_closing_opening_laws(spark, interior_cells):
    base = _df(spark, interior_cells)
    closed = {r["cell"] for r in closing(base, RES, 1).collect()}
    opened = {r["cell"] for r in opening(base, RES, 1).collect()}
    assert interior_cells <= closed  # extensive away from the border
    assert opened <= interior_cells  # anti-extensive everywhere
    # both ops are exactly the two-step composition of the references
    assert closed == _np_morph(
        _np_morph(interior_cells, 1, "dilate"), 1, "erode"
    )
    assert opened == _np_morph(
        _np_morph(interior_cells, 1, "erode"), 1, "dilate"
    )


def test_opening_antiextensive_on_border(spark, base_cells):
    """Opening ⊆ base holds even WITH border cells (erode only keeps cells
    whose full neighborhood is in-domain and present, so every dilated
    output is a neighbor of such a cell — hence in base)."""
    base = _df(spark, base_cells)
    opened = {r["cell"] for r in opening(base, RES, 1).collect()}
    assert opened <= base_cells


def _np_local_max(vals: dict[int, int], k: int) -> set[int]:
    """Brute NMS reference: cell wins iff (n, -cell) beats every in-domain
    neighbor present in the raster."""
    out = set()
    for c, n in vals.items():
        ix, iy = c // CELL_SHIFT, c % CELL_SHIFT
        best = True
        for dx in range(-k, k + 1):
            for dy in range(-k, k + 1):
                nx, ny = ix + dx, iy + dy
                if not (0 <= nx <= MX and 0 <= ny <= MY):
                    continue
                nc = nx * CELL_SHIFT + ny
                if nc == c or nc not in vals:
                    continue
                if (vals[nc], -nc) > (n, -c):
                    best = False
        if best:
            out.add(c)
    return out


def _vdf(spark, vals):
    return spark.createDataFrame(
        [(int(c), int(n)) for c, n in sorted(vals.items())], "cell long, n long"
    )


def test_local_maxima_single_spike(spark):
    from osm_history_splitter_spark.operators.raster import local_maxima

    center = 10 * CELL_SHIFT + 10
    vals = {center: 9}
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if (dx, dy) != (0, 0):
                vals[(10 + dx) * CELL_SHIFT + 10 + dy] = 3
    got = {(r["cell"], r["n"]) for r in local_maxima(_vdf(spark, vals), RES, 1).collect()}
    assert got == {(center, 9)}


def test_local_maxima_plateau_tie_lowest_id(spark):
    """Two adjacent equal maxima: exactly the lower cell id survives."""
    from osm_history_splitter_spark.operators.raster import local_maxima

    a = 5 * CELL_SHIFT + 5
    b = 5 * CELL_SHIFT + 6
    got = {r["cell"] for r in local_maxima(_vdf(spark, {a: 7, b: 7}), RES, 1).collect()}
    assert got == {a}


def test_local_maxima_isolated_cells_all_win(spark):
    from osm_history_splitter_spark.operators.raster import local_maxima

    vals = {2 * CELL_SHIFT + 2: 1, 20 * CELL_SHIFT + 20: 1, 40 * CELL_SHIFT + 8: 2}
    got = {r["cell"] for r in local_maxima(_vdf(spark, vals), RES, 2).collect()}
    assert got == set(vals)


@pytest.mark.parametrize("k", [1, 2])
def test_local_maxima_random_differential(spark, k):
    from osm_history_splitter_spark.operators.raster import local_maxima

    rng = np.random.default_rng(11)
    ix = rng.integers(0, MX + 1, 250)
    iy = rng.integers(0, MY + 1, 250)
    ns = rng.integers(1, 6, 250)  # small value range: ties are common
    vals = {}
    for x, y, n in zip(ix.tolist(), iy.tolist(), ns.tolist()):
        vals[x * CELL_SHIFT + y] = n
    got = {
        (r["cell"], r["n"])
        for r in local_maxima(_vdf(spark, vals), RES, k).collect()
    }
    assert got == {(c, vals[c]) for c in _np_local_max(vals, k)}


def test_triple_blur_is_bspline_kernel(spark):
    # three k=1 box passes over a unit impulse must produce the separable
    # quadratic-B-spline kernel: per-axis weights [1,3,6,7,6,3,1] (the
    # "3 box blurs ~ Gaussian" composition the kde_heatmap query uses)
    from osm_history_splitter_spark.operators.raster import box_blur

    cx, cy = 16, 16  # well inside the res-5 domain: no border clipping
    out = _vdf(spark, {cx * CELL_SHIFT + cy: 1})
    for _ in range(3):
        out = box_blur(out, RES, 1, value_cols=("n",))
    got = {r["cell"]: r["n"] for r in out.collect()}
    w = [1, 3, 6, 7, 6, 3, 1]
    want = {
        (cx + dx) * CELL_SHIFT + (cy + dy): w[dx + 3] * w[dy + 3]
        for dx in range(-3, 4)
        for dy in range(-3, 4)
    }
    assert got == want
    assert sum(got.values()) == 27**2  # mass = (3^2)^3 per axis pair


from osm_history_splitter_spark.operators.raster import (  # noqa: E402
    D8_OFFSETS,
    raster_gradient,
)


def _np_gradient(vals: dict[int, int]):
    """Dense reference: central differences + D8 max-ascent, 0-padded."""
    out = {}
    for c, _v in vals.items():
        ix, iy = c // CELL_SHIFT, c % CELL_SHIFT

        def at(dx, dy):
            nx, ny = ix + dx, iy + dy
            if not (0 <= nx <= MX and 0 <= ny <= MY):
                return 0
            return vals.get(nx * CELL_SHIFT + ny, 0)

        gx = at(1, 0) - at(-1, 0)
        gy = at(0, 1) - at(0, -1)
        nvals = [at(dx, dy) for dx, dy in D8_OFFSETS]
        mv = max(nvals)
        d8 = nvals.index(mv) if mv > 0 else -1
        out[c] = (gx, gy, d8)
    return out


@pytest.mark.parametrize("seed,n", [(11, 250), (12, 600)])
def test_gradient_matches_dense_reference(spark, seed, n):
    rng = np.random.default_rng(seed)
    ix = rng.integers(0, MX + 1, n)
    iy = rng.integers(0, MY + 1, n)
    vals = {
        int(x) * CELL_SHIFT + int(y): int(v)
        for x, y, v in zip(ix, iy, rng.integers(1, 100, n))
    }
    df = spark.createDataFrame(list(vals.items()), "cell long, n long")
    got = {
        r.cell: (r.gx, r.gy, r.d8)
        for r in raster_gradient(df, RES).collect()
    }
    assert got == _np_gradient(vals)
    assert any(d[2] >= 0 for d in got.values()), "vacuous: no ascent cell"
    assert any(d[2] == -1 for d in got.values()) or n < 300


def test_gradient_isolated_cell_is_flat(spark):
    df = spark.createDataFrame([(5 * CELL_SHIFT + 5, 9)], "cell long, n long")
    [r] = raster_gradient(df, RES).collect()
    assert (r.gx, r.gy, r.d8) == (0, 0, -1)


def test_gradient_tie_breaks_to_lowest_direction(spark):
    # equal E and N neighbors: E (index 0) must win over N (index 2)
    c = 5 * CELL_SHIFT + 5
    df = spark.createDataFrame(
        [(c, 1), (c + CELL_SHIFT, 7), (c + 1, 7)], "cell long, n long"
    )
    got = {r.cell: r.d8 for r in raster_gradient(df, RES).collect()}
    assert got[c] == 0
