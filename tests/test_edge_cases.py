"""T1 predicate edge suite + T2 closure suite (FIXTURES.md §7)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from osm_history_splitter_spark.model import NODE_SCHEMA, RELATION_SCHEMA
from osm_history_splitter_spark.operators.softcut import softcut_membership
from osm_history_splitter_spark.operators.spatial_join import assign_extracts
from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog

TS = dt.datetime(2020, 1, 1)


def nodes_df(spark, pts):
    return spark.createDataFrame(
        [(i, 1, True, TS, 0, 0, "u", lat, lon, {}) for i, (lon, lat) in enumerate(pts)],
        schema=NODE_SCHEMA,
    )


def members_of(df):
    return sorted((r["id"], r["extract"]) for r in df.select("id", "extract").collect())


class TestBboxStrictness:
    """P1: nodes exactly on any bbox edge are OUT (cut.hpp:36-40)."""

    CASES = [
        ((0.0, 0.0), True),     # center
        ((-1.0, 0.0), False),   # on minlon edge
        ((1.0, 0.0), False),    # on maxlon edge
        ((0.0, -1.0), False),   # on minlat edge
        ((0.0, 1.0), False),    # on maxlat edge
        ((-1.0, -1.0), False),  # corner
        ((0.999999, 0.999999), True),
        ((-0.999999, -0.999999), True),
    ]

    def test_table(self, spark):
        cat = ExtractCatalog([Extract.bbox("b", -1.0, -1.0, 1.0, 1.0)])
        df = nodes_df(spark, [c[0] for c in self.CASES])
        got = {r["id"] for r in assign_extracts(df, cat).collect()}
        expected = {i for i, (_, keep) in enumerate(self.CASES) if keep}
        assert got == expected


class TestAntimeridianPoles:
    def test_extreme_coordinates(self, spark):
        cat = ExtractCatalog(
            [
                Extract.bbox("west_am", -180.0, -90.0, -179.0, 90.0),
                Extract.bbox("east_am", 179.0, -90.0, 180.0, 90.0),
                Extract.bbox("north_pole", -180.0, 89.0, 180.0, 90.0),
            ]
        )
        pts = [
            (-179.9999, 0.0),   # 0: west_am
            (179.9999, 0.0),    # 1: east_am
            (0.0, 89.9),        # 2: north_pole
            (-180.0, 0.0),      # 3: on edge -> nothing (strict)
            (180.0, 0.0),       # 4: on edge -> nothing
            (0.0, 90.0),        # 5: on maxlat edge -> nothing
            (179.5, 89.5),      # 6: east_am AND north_pole
        ]
        got = members_of(assign_extracts(nodes_df(spark, pts), cat))
        assert got == [
            (0, "west_am"), (1, "east_am"), (2, "north_pole"),
            (6, "east_am"), (6, "north_pole"),
        ]

    def test_polygon_near_antimeridian(self, spark):
        rings = [[[179.0, -10.0], [180.0, -10.0], [180.0, 10.0], [179.0, 10.0], [179.0, -10.0]]]
        cat = ExtractCatalog([Extract.poly("am", rings)])
        pts = [(179.5, 0.0), (180.0, 0.0), (178.9999, 0.0)]
        got = members_of(assign_extracts(nodes_df(spark, pts), cat))
        assert got == [(0, "am")]


class TestRelationClosure:
    """T2: cascades in both stream orders + dead refs (softcut.hpp:269-287).
    The engine is order-free; both orders MUST give identical results."""

    def _world(self, spark, order):
        # r1 -> r2 -> r3 chain: r3 has the direct node hit
        rels = {
            "r1": (1001, 1, True, TS, 0, 0, "u", [("r", 1002, "")], {}),
            "r2": (1002, 1, True, TS, 0, 0, "u", [("r", 1003, "")], {}),
            "r3": (1003, 1, True, TS, 0, 0, "u", [("n", 0, "")], {}),
            "dead": (1004, 1, True, TS, 0, 0, "u", [("n", 999999, ""), ("r", 888888, "")], {}),
        }
        rows = [rels[k] for k in order]
        rdf = spark.createDataFrame(rows, schema=RELATION_SCHEMA)
        ndf = nodes_df(spark, [(0.0, 0.0)])
        wdf = spark.createDataFrame(
            [], "id long, version int, refs array<long>"
        )
        cat = ExtractCatalog([Extract.bbox("b", -1.0, -1.0, 1.0, 1.0)])
        m = softcut_membership(ndf, wdf, rdf, cat, persist=False)
        return sorted(r["id"] for r in m.relation_members.collect())

    def test_forward_order(self, spark):
        assert self._world(spark, ["r1", "r2", "r3", "dead"]) == [1001, 1002, 1003]

    def test_backward_order(self, spark):
        assert self._world(spark, ["dead", "r3", "r2", "r1"]) == [1001, 1002, 1003]

    def test_cycle_terminates(self, spark):
        rows = [
            (2001, 1, True, TS, 0, 0, "u", [("r", 2002, "")], {}),
            (2002, 1, True, TS, 0, 0, "u", [("r", 2001, ""), ("n", 0, "")], {}),
        ]
        rdf = spark.createDataFrame(rows, schema=RELATION_SCHEMA)
        ndf = nodes_df(spark, [(0.0, 0.0)])
        wdf = spark.createDataFrame([], "id long, version int, refs array<long>")
        cat = ExtractCatalog([Extract.bbox("b", -1.0, -1.0, 1.0, 1.0)])
        m = softcut_membership(ndf, wdf, rdf, cat, persist=False)
        assert sorted(r["id"] for r in m.relation_members.collect()) == [2001, 2002]


class TestPolyHoleEndToEnd:
    def test_point_in_hole_excluded(self, spark):
        rings = [
            [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]],
            [[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0], [4.0, 4.0]],
        ]
        cat = ExtractCatalog([Extract.poly("holey", rings)])
        pts = [(2.0, 2.0), (5.0, 5.0), (4.0, 5.0)]  # in, in-hole, on hole edge
        got = members_of(assign_extracts(nodes_df(spark, pts), cat))
        assert got == [(0, "holey")]


def test_total_cover_budget_degrades_resolution_not_correctness(spark):
    """A catalog of many extracts must keep its TOTAL broadcast cover under
    max_total_cover_cells by degrading resolution uniformly; membership is
    unchanged (coarser cover only moves cells to the exact-refine path)."""
    import numpy as np

    from osm_history_splitter_spark.operators.spatial_join import assign_extracts
    from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog

    tiles = [
        Extract.bbox(f"t{i}", -50.0 + i, 0.0, -48.0 + i, 2.0) for i in range(60)
    ]
    rich = ExtractCatalog(list(tiles))
    budget = ExtractCatalog(list(tiles), max_total_cover_cells=3000)
    assert len(budget.cover_rows()) <= 3000
    assert len(rich.cover_rows()) > len(budget.cover_rows())

    rng = np.random.default_rng(31)
    pts = spark.createDataFrame(
        [
            (int(i), float(lon), float(lat))
            for i, (lon, lat) in enumerate(
                zip(rng.uniform(-55, 15, 1500), rng.uniform(-2, 4, 1500))
            )
        ],
        "id long, lon double, lat double",
    )
    a = {(r["id"], r["extract"]) for r in assign_extracts(pts, rich).collect()}
    b = {(r["id"], r["extract"]) for r in assign_extracts(pts, budget).collect()}
    assert a == b and a
