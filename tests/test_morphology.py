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
