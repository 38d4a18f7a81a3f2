"""Raster→vector polygonization (operators/raster.py: region_labels /
boundary_edges / polygonize).

The strongest check is the round trip through the certified PIP kernel:
polygonize a classified raster, then evaluate every cell center against the
produced rings (even-odd parity — holes cancel outers) and require the
in/out answer to reproduce region membership exactly.
"""

from __future__ import annotations

import numpy as np
import pytest

from osm_history_splitter_spark.functions import grid
from osm_history_splitter_spark.functions.geometry import points_in_rings
from osm_history_splitter_spark.operators.raster import (
    _ring_area2,
    _stitch_rings,
    boundary_edges,
    polygonize,
    region_labels,
)

RES = 8
W = grid.cell_width(RES)


def _raster(spark, cells):
    """cells: [(ix, iy, cls)] → raster DF."""
    rows = [
        (int(ix) * grid.CELL_SHIFT + int(iy), int(cls)) for ix, iy, cls in cells
    ]
    return spark.createDataFrame(rows, "cell long, cls int")


def _bfs_labels(cells):
    """Reference 4-adjacency labeling (pure python)."""
    cset = {(ix, iy): cls for ix, iy, cls in cells}
    label = {}
    for start in sorted(cset):
        if start in label:
            continue
        comp = [start]
        seen = {start}
        q = [start]
        while q:
            x, y = q.pop()
            for nx, ny in ((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)):
                if (
                    (nx, ny) in cset
                    and (nx, ny) not in seen
                    and cset[nx, ny] == cset[x, y]
                ):
                    seen.add((nx, ny))
                    comp.append((nx, ny))
                    q.append((nx, ny))
        lbl = min(ix * grid.CELL_SHIFT + iy for ix, iy in comp)
        for c in comp:
            label[c] = lbl
    return {
        ix * grid.CELL_SHIFT + iy: label[(ix, iy)] for ix, iy, _ in cells
    }


def _rings_by_region(pdf):
    out = {}
    for (region, ring), grp in pdf.groupby(["region", "ring"]):
        grp = grp.sort_values("seq")
        arr = np.stack([grp["lon"].to_numpy(), grp["lat"].to_numpy()], axis=1)
        out.setdefault(region, []).append((arr, bool(grp["is_hole"].iloc[0])))
    return out


def _assert_roundtrip(spark, cells):
    """polygonize(raster) rings must reproduce region membership at every
    cell center of the bounding window, via the certified PIP kernel."""
    df = _raster(spark, cells)
    want = _bfs_labels(cells)
    got_labels = {
        r.cell: r.region for r in region_labels(df).collect()
    }
    assert got_labels == want

    poly = polygonize(df, RES).toPandas()
    rings = _rings_by_region(poly)
    assert set(rings) == set(want.values())

    ixs = [ix for ix, _, _ in cells]
    iys = [iy for _, iy, _ in cells]
    span_x = range(min(ixs) - 1, max(ixs) + 2)
    span_y = range(min(iys) - 1, max(iys) + 2)
    centers = np.array(
        [
            ((x + 0.5) * W - 180.0, (y + 0.5) * W - 90.0)
            for x in span_x
            for y in span_y
        ]
    )
    keys = [
        x * grid.CELL_SHIFT + y for x in span_x for y in span_y
    ]
    for region, rlist in rings.items():
        inside = points_in_rings(
            centers[:, 0], centers[:, 1], [r for r, _ in rlist]
        )
        member = np.array([want.get(k) == region for k in keys])
        np.testing.assert_array_equal(inside, member)

    # edge conservation: every boundary edge appears in exactly one ring
    n_edges = boundary_edges(df).count()
    ring_edges = sum(
        len(grp) - 1 for _, grp in poly.groupby(["region", "ring"])
    )
    assert ring_edges == n_edges


def test_single_cell(spark):
    df = _raster(spark, [(100, 100, 1)])
    poly = polygonize(df, RES).toPandas()
    assert len(poly) == 5  # 4 corners + closing vertex
    assert not poly["is_hole"].any()
    _assert_roundtrip(spark, [(100, 100, 1)])


def test_square_block(spark):
    cells = [(x, y, 1) for x in (10, 11) for y in (20, 21)]
    df = _raster(spark, cells)
    poly = polygonize(df, RES).toPandas()
    assert len(poly) == 9  # 8 edges + closing vertex
    assert poly["region"].nunique() == 1
    _assert_roundtrip(spark, cells)


def test_donut_has_clockwise_hole(spark):
    cells = [
        (x, y, 1) for x in (5, 6, 7) for y in (5, 6, 7) if (x, y) != (6, 6)
    ]
    df = _raster(spark, cells)
    poly = polygonize(df, RES).toPandas()
    assert poly["region"].nunique() == 1
    by_ring = {
        ring: grp for (_, ring), grp in poly.groupby(["region", "ring"])
    }
    assert len(by_ring) == 2
    holes = {r: g["is_hole"].iloc[0] for r, g in by_ring.items()}
    assert sorted(holes.values()) == [False, True]
    sizes = {holes[r]: len(g) - 1 for r, g in by_ring.items()}
    assert sizes == {False: 12, True: 4}
    _assert_roundtrip(spark, cells)


def test_diagonal_cells_are_two_regions(spark):
    cells = [(0, 0, 1), (1, 1, 1)]
    labels = {r.cell: r.region for r in region_labels(_raster(spark, cells)).collect()}
    assert len(set(labels.values())) == 2
    _assert_roundtrip(spark, cells)


def test_self_corner_touch_single_region(spark):
    # L of (0,0),(0,1),(1,1): the boundary passes vertex (1,1) twice;
    # the left-turn rule must keep one simple ring without crossing
    cells = [(0, 0, 1), (0, 1, 1), (1, 1, 1)]
    _assert_roundtrip(spark, cells)


def test_two_classes_partition(spark):
    cells = [(x, y, 1 if x < 2 else 2) for x in range(4) for y in range(2)]
    _assert_roundtrip(spark, cells)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_grid_roundtrip(spark, seed):
    rng = np.random.default_rng(seed)
    mask = rng.random((10, 10)) < 0.55
    cells = [
        (30 + x, 40 + y, 1)
        for x in range(10)
        for y in range(10)
        if mask[x, y]
    ]
    if not cells:
        pytest.skip("empty grid")
    _assert_roundtrip(spark, cells)


def test_stitch_rejects_non_eulerian():
    with pytest.raises(AssertionError):
        _stitch_rings([(0, 0, 1, 0), (1, 0, 1, 1)])  # open path


def test_ring_area_sign():
    ccw = [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]
    assert _ring_area2(ccw) > 0
    assert _ring_area2(list(reversed(ccw))) < 0
