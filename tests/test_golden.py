"""T0 — golden-port test: the reference's own end-to-end fixture
(``test/version-two-node-after.osh`` + ``test/test.config``) must match
row-for-row (FIXTURES.md §6)."""

from __future__ import annotations

from osm_history_splitter_spark.operators.hardcut import hardcut
from osm_history_splitter_spark.operators.softcut import softcut, softcut_membership

from .fixtures import golden_catalog, golden_nodes, golden_relations, golden_ways


def id_versions(df):
    return sorted(
        (r["id"], r["version"]) for r in df.select("id", "version").collect()
    )


def test_softcut_golden(spark):
    res = softcut(
        golden_nodes(spark),
        golden_ways(spark),
        golden_relations(spark),
        golden_catalog(),
        persist=False,
    )
    assert id_versions(res.nodes) == [
        (1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2),
    ]
    assert id_versions(res.ways) == [(10, 1), (10, 2)]
    assert res.relations.count() == 0
    # every emitted row carries the extract name
    assert set(r["extract"] for r in res.nodes.select("extract").distinct().collect()) == {"test"}


def test_softcut_membership_tables(spark):
    m = softcut_membership(
        golden_nodes(spark),
        golden_ways(spark),
        golden_relations(spark),
        golden_catalog(),
        persist=False,
    )
    assert sorted(r["id"] for r in m.node_members.collect()) == [3]
    assert sorted(r["id"] for r in m.way_members.collect()) == [10]
    # extra nodes: union of refs over way 10's versions = {1,2,3}
    assert sorted(r["id"] for r in m.extra_nodes.collect()) == [1, 2, 3]


def test_hardcut_golden(spark):
    res = hardcut(
        golden_nodes(spark),
        golden_ways(spark),
        golden_relations(spark),
        golden_catalog(),
    )
    # only node 3 v1 is inside; way 10 v2 clips to [3] -> dropped (<2 refs)
    assert id_versions(res.nodes) == [(3, 1)]
    assert res.ways.count() == 0
    assert res.relations.count() == 0


def test_hardcut_preserves_ref_order(spark):
    """Clip keeps original ref order (hardcut.hpp:175): use a richer world
    where several refs survive."""
    import datetime as dt

    from osm_history_splitter_spark.model import NODE_SCHEMA, WAY_SCHEMA
    from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog

    ts = dt.datetime(2012, 1, 1)
    nodes = spark.createDataFrame(
        [
            (1, 1, True, ts, 0, 0, "u", 0.5, 0.5, {}),
            (2, 1, True, ts, 0, 0, "u", 9.0, 9.0, {}),
            (3, 1, True, ts, 0, 0, "u", 0.2, 0.2, {}),
            (4, 1, True, ts, 0, 0, "u", 0.9, 0.1, {}),
        ],
        schema=NODE_SCHEMA,
    )
    ways = spark.createDataFrame(
        [(7, 1, True, ts, 0, 0, "u", [4, 2, 1, 3], {})], schema=WAY_SCHEMA
    )
    rels = spark.createDataFrame([], schema="id long, version int, members array<struct<type:string,ref:long,role:string>>")
    cat = ExtractCatalog([Extract.bbox("b", -1.0, -1.0, 1.0, 1.0)])
    res = hardcut(nodes, ways, rels.selectExpr("id", "version", "cast(null as boolean) visible", "cast(null as timestamp) ts", "cast(null as long) uid", "cast(null as long) changeset", "cast(null as string) user", "members", "cast(null as map<string,string>) tags"), cat)
    rows = res.ways.collect()
    assert len(rows) == 1
    assert rows[0]["refs"] == [4, 1, 3]  # node 2 clipped out, order kept
