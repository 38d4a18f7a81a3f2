"""H3-style cover compaction (``grid.compact_cover``) and the single-scan
ladder join (``assign_extracts(strategy='ladder')``).

Soundness story: a compacted cover must describe EXACTLY the same area as
the single-resolution cover it came from — uncompacting every level back to
the original resolution reproduces the original fully-inside set, and the
boundary (refine) cells are untouched. On top of that, the end-to-end
spatial join must return identical (point, extract) rows for compacted and
baseline catalogs under both physical strategies.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_history_splitter_spark.functions import grid
from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog


def _split_levels(leveled):
    fully = {}
    boundary = {}
    for res, cells, f in leveled:
        if f.any():
            fully[res] = cells[f]
        if (~f).any():
            boundary[res] = cells[~f]
    return fully, boundary


@settings(max_examples=40, deadline=None)
@given(
    minlon=st.floats(-170, 150),
    minlat=st.floats(-80, 70),
    w=st.floats(1.0, 25.0),
    h=st.floats(1.0, 15.0),
    res=st.integers(4, 8),
    levels=st.integers(1, 4),
)
def test_compact_area_identical_bbox(minlon, minlat, w, h, res, levels):
    cells, fully = grid.cover_bbox(minlon, minlat, minlon + w, minlat + h, res)
    leveled = grid.compact_cover(cells, fully, res, levels=levels)
    fl, bl = _split_levels(leveled)
    # boundary cells pass through at the original resolution, bit-identical
    assert list(bl.keys()) in ([], [res])
    got_boundary = bl.get(res, np.array([], dtype=np.int64))
    assert set(got_boundary.tolist()) == set(cells[~fully].tolist())
    # uncompacted fully set == original fully set (area identity)
    expanded = [
        grid.uncompact_cells(c, r, res) for r, c in fl.items()
    ]
    got_fully = (
        np.concatenate(expanded) if expanded else np.array([], dtype=np.int64)
    )
    assert sorted(got_fully.tolist()) == sorted(cells[fully].tolist())
    # no level finer than res, none coarser than res - levels
    assert all(res - levels <= r <= res for r in leveled_res(leveled))
    # levels are disjoint: no cell double-covered after expansion
    assert len(got_fully) == len(set(got_fully.tolist()))


def leveled_res(leveled):
    return [r for r, _, _ in leveled]


def test_compact_shrinks_large_interior():
    # 64x64-cell bbox (res 8: cell width 0.703 deg, 45-deg box): interior
    # ~ 62*62 cells; 3 levels should cut the row count by >5x (interior
    # collapses toward 8x8 parents + remainder)
    cells, fully = grid.cover_bbox(0.0, 0.0, 44.9, 44.9, 8)
    leveled = grid.compact_cover(cells, fully, 8, levels=3)
    n_rows = sum(len(c) for _, c, _ in leveled)
    assert len(cells) >= 4096 * 0.9
    assert n_rows < len(cells) / 5


def test_compact_zero_levels_is_rejected_only_below_zero():
    cells, fully = grid.cover_bbox(0, 0, 10, 10, 4)
    out = grid.compact_cover(cells, fully, 4, levels=0)
    assert leveled_res(out) == [4]
    with pytest.raises(ValueError):
        grid.compact_cover(cells, fully, 4, levels=-1)


def test_compact_poly_cover_area_identical():
    # many-vertex circle: short edges -> small per-edge bboxes -> a real
    # fully-inside interior for compaction to chew on
    t = np.linspace(0.0, 2 * np.pi, 120)
    ring = np.stack([20.0 + 18.0 * np.cos(t), 10.0 + 18.0 * np.sin(t)], axis=1)
    cells, fully = grid.cover_rings([ring], 8)
    assert fully.sum() > 100  # the interior exists
    leveled = grid.compact_cover(cells, fully, 8, levels=3)
    fl, bl = _split_levels(leveled)
    assert fl  # compaction produced fully levels
    got_fully = np.concatenate(
        [grid.uncompact_cells(c, r, 8) for r, c in fl.items()]
    )
    assert sorted(got_fully.tolist()) == sorted(cells[fully].tolist())
    assert set(bl.get(8, np.array([], np.int64)).tolist()) == set(
        cells[~fully].tolist()
    )


def _catalog(compact_levels: int) -> ExtractCatalog:
    # mixed sizes/kinds: a continent bbox, a city bbox (different pick_res),
    # and a polygon — exercises multi-resolution covers even pre-compaction
    cat = ExtractCatalog(compact_levels=compact_levels)
    cat.add(Extract.bbox("continent", -30.0, 20.0, 60.0, 75.0))
    cat.add(Extract.bbox("city", 13.0, 52.0, 13.8, 52.7))
    cat.add(
        Extract.poly(
            "wedge", [[[-10.0, -10.0], [30.0, -5.0], [5.0, 40.0]]]
        )
    )
    return cat


def _random_points(spark, n=3000, seed=7):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-40, 70, n).round(5)
    lat = rng.uniform(-20, 80, n).round(5)
    return spark.createDataFrame(
        [(int(i), float(a), float(b)) for i, (a, b) in enumerate(zip(lon, lat))],
        "id long, lon double, lat double",
    )


def _rows(df):
    return sorted((r.id, r.extract) for r in df.collect())


def test_assign_extracts_compacted_matches_baseline(spark):
    from osm_history_splitter_spark.operators.spatial_join import (
        assign_extracts,
    )

    pts = _random_points(spark)
    base = _rows(assign_extracts(pts, _catalog(0), strategy="loop"))
    assert base  # sanity: the window actually hits the extracts
    for levels in (1, 3):
        for strategy in ("loop", "ladder"):
            got = _rows(
                assign_extracts(pts, _catalog(levels), strategy=strategy)
            )
            assert got == base, (levels, strategy)
    # ladder on the UNcompacted catalog too (multi-res from pick_res alone)
    assert _rows(assign_extracts(pts, _catalog(0), strategy="ladder")) == base


def test_ladder_plan_single_scan_single_join(spark):
    """The ladder strategy's reason to exist: ONE broadcast join and ONE
    scan of the input regardless of how many cover levels there are."""
    from osm_history_splitter_spark.operators.spatial_join import (
        assign_extracts,
    )

    cat = _catalog(3)
    rows = cat.cover_rows()
    assert len({r[1] for r in rows}) > 1  # compaction produced multi-res
    pts = _random_points(spark, n=10)
    plan = (
        assign_extracts(pts, cat, strategy="ladder")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") == 1
    assert "CartesianProduct" not in plan
    assert plan.count("LocalTableScan") <= 2  # points + broadcast cover

    loop_plan = (
        assign_extracts(pts, cat, strategy="loop")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert loop_plan.count("BroadcastHashJoin") > 1  # what ladder removes


def test_compacted_cover_rows_smaller(spark):
    full = ExtractCatalog(compact_levels=0)
    comp = ExtractCatalog(compact_levels=3)
    for cat in (full, comp):
        cat.add(Extract.bbox("big", -30.0, 20.0, 60.0, 75.0))
    assert len(comp.cover_rows()) < len(full.cover_rows()) / 3
