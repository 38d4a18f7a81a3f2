"""Region labeling (raster dissolve): union-find differential on random
lattices + analytic shapes (two blobs split by a gap, a diagonal chain —
8-connectivity joins it, distance-2 does not unless k=2) and the
min-cell-id label contract."""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from osm_history_splitter_spark.functions.grid import CELL_SHIFT  # noqa: E402
from osm_history_splitter_spark.operators.raster import region_label  # noqa: E402

RES = 5
MX = (1 << (RES + 1)) - 1
MY = (1 << RES) - 1


def _py_regions(cells: set[int], k: int) -> dict[int, int]:
    """Union-find reference: min cell id per Chebyshev-k component."""
    parent = {c: c for c in cells}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for c in cells:
        ix, iy = c // CELL_SHIFT, c % CELL_SHIFT
        for dx in range(-k, k + 1):
            for dy in range(-k, k + 1):
                nc = (ix + dx) * CELL_SHIFT + (iy + dy)
                if nc in cells and 0 <= ix + dx <= MX and 0 <= iy + dy <= MY:
                    union(c, nc)
    return {c: find(c) for c in cells}


def _run(spark, cells: set[int], k: int = 1) -> dict[int, int]:
    df = spark.createDataFrame([(c,) for c in cells], "cell long")
    return {
        r["cell"]: r["region"]
        for r in region_label(df, RES, k=k).collect()
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("k", [1, 2])
def test_random_lattice_matches_union_find(spark, seed, k):
    rng = random.Random(seed)
    cells = {
        ix * CELL_SHIFT + iy
        for ix in range(0, 24)
        for iy in range(0, 16)
        if rng.random() < 0.45
    }
    assert _run(spark, cells, k) == _py_regions(cells, k)


def test_two_blobs_and_isolated_cell(spark):
    """Two 3×3 blobs separated by one empty column (Chebyshev distance
    2) stay distinct regions at k=1 and merge at k=2; a far isolated
    cell always labels itself."""
    blob_a = {ix * CELL_SHIFT + iy for ix in range(0, 3) for iy in range(0, 3)}
    blob_b = {ix * CELL_SHIFT + iy for ix in range(4, 7) for iy in range(0, 3)}
    lone = 20 * CELL_SHIFT + 20
    cells = blob_a | blob_b | {lone}

    got1 = _run(spark, cells, k=1)
    assert {got1[c] for c in blob_a} == {min(blob_a)}
    assert {got1[c] for c in blob_b} == {min(blob_b)}
    assert got1[lone] == lone

    got2 = _run(spark, cells, k=2)
    assert {got2[c] for c in blob_a | blob_b} == {min(blob_a)}
    assert got2[lone] == lone


def test_diagonal_chain_is_one_region(spark):
    """A pure diagonal (queen-only) chain: 8-connectivity makes it one
    region labeled by its head — the case 4-connectivity would split
    into singletons."""
    cells = {i * CELL_SHIFT + i for i in range(12)}
    got = _run(spark, cells, k=1)
    assert set(got.values()) == {0}
