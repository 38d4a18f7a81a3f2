"""J7: one-pass multi-level assignment == staged parent-then-child splits,
over the reference's real clipbounds tree."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_history_splitter_spark.model import NODE_SCHEMA
from osm_history_splitter_spark.operators.spatial_join import assign_extracts
from osm_history_splitter_spark.plans.catalog import ExtractCatalog
from osm_history_splitter_spark.plans.hierarchy import (
    load_clipbounds_tree,
    parent_of,
    topo_batches,
)

TS = dt.datetime(2020, 1, 1)


@pytest.fixture(scope="module")
def tree():
    return load_clipbounds_tree("/root/reference/clipbounds", skip=("aaa_test",))


def test_tree_loads_and_orders(tree):
    names = [e.name for e in tree]
    assert "europe" in names
    assert "europe/germany" in names
    assert "europe/germany/bayern" in names or "europe/germany/nordrhein-westfalen" in names
    batches = topo_batches(tree)
    assert names and len(batches) >= 3
    seen = set()
    for batch in batches:
        for n in batch:
            p = parent_of(n)
            assert p is None or p in seen or p not in names
            seen.add(n)


def test_one_pass_equals_staged(spark, tree):
    """Points assigned to a child in one pass == points assigned to the
    child after restricting to the parent's output."""
    sub = ExtractCatalog(
        [e for e in tree if e.name in ("europe", "europe/germany")]
    )
    assert len(sub) == 2
    rng = np.random.default_rng(23)
    rows = [
        (int(i), 1, True, TS, 0, 0, "u", float(lat), float(lon), {})
        for i, (lon, lat) in enumerate(
            zip(rng.uniform(-10, 30, 1500), rng.uniform(35, 65, 1500))
        )
    ]
    nodes = spark.createDataFrame(rows, schema=NODE_SCHEMA)
    one_pass = assign_extracts(nodes, sub)
    one_pass_de = {
        r["id"] for r in one_pass.filter("extract = 'europe/germany'").collect()
    }
    # staged: split europe first, feed only its rows to the germany split
    eu_cat = ExtractCatalog([e for e in tree if e.name == "europe"])
    de_cat = ExtractCatalog([e for e in tree if e.name == "europe/germany"])
    eu_rows = assign_extracts(nodes, eu_cat).drop("extract")
    staged_de = {r["id"] for r in assign_extracts(eu_rows, de_cat).collect()}
    assert staged_de == one_pass_de
    assert one_pass_de  # non-vacuous: some points actually in germany


def test_staged_runner_matches_one_pass(spark, tree, tmp_path):
    """run_hierarchy (children split from parent OUTPUT, reference
    tools/split-all-clipbounds.py:60-101) produces exactly the rows the
    one-pass multi-extract split produces, and its manifest proves
    parent-before-child ordering."""
    from osm_history_splitter_spark.model import RELATION_SCHEMA, WAY_SCHEMA
    from osm_history_splitter_spark.plans.hierarchy import run_hierarchy
    from osm_history_splitter_spark.splitter import run_split

    sub = ExtractCatalog(
        [e for e in tree if e.name in ("europe", "europe/germany", "africa")]
    )
    assert len(sub) == 3
    rng = np.random.default_rng(29)
    node_rows = [
        (int(i), 1, True, TS, 0, 0, "u", float(lat), float(lon), {})
        for i, (lon, lat) in enumerate(
            zip(rng.uniform(-20, 40, 1200), rng.uniform(-35, 65, 1200))
        )
    ]
    nodes = spark.createDataFrame(node_rows, schema=NODE_SCHEMA)
    way_rows = [
        (1000 + w, 1, True, TS, 0, 0, "u", [int(3 * w), int(3 * w + 1), int(3 * w + 2)], {})
        for w in range(300)
    ]
    ways = spark.createDataFrame(way_rows, schema=WAY_SCHEMA)
    rel_rows = [
        (5000 + r, 1, True, TS, 0, 0, "u",
         [("w", 1000 + 3 * r, "m"), ("n", int(9 * r), "m")], {})
        for r in range(80)
    ]
    rels = spark.createDataFrame(rel_rows, schema=RELATION_SCHEMA)

    one_out = str(tmp_path / "one")
    run_split(spark, nodes, ways, rels, sub, one_out, mode="softcut")
    staged_out = str(tmp_path / "staged")
    manifest = run_hierarchy(spark, nodes, ways, rels, sub, staged_out, mode="softcut")

    # ordering proof: each non-root job's source appears as a child of an
    # earlier job
    seen: set[str] = set()
    for job in manifest["jobs"]:
        if not job["source"].startswith("_root"):
            assert job["source"] in seen, manifest["jobs"]
        seen.update(job["children"])
    assert {"europe", "europe/germany", "africa"} <= seen

    def rows_of(path, entity, extract):
        try:
            df = spark.read.parquet(f"{path}/{entity}")
        except Exception:
            return set()
        return {
            (r["id"], r["version"])
            for r in df.filter(df["extract"] == extract).collect()
        }

    for entity in ("nodes", "ways", "relations"):
        # leaf: germany was split FROM europe's output in the staged run
        one = rows_of(one_out, entity, "europe/germany")
        staged = rows_of(str(tmp_path / "staged/jobs/europe"), entity, "europe/germany")
        assert staged == one, (entity, len(staged), len(one))
    # and a top-level extract comes from the depth-0 root job
    assert rows_of(one_out, "nodes", "africa") == rows_of(
        str(tmp_path / "staged/jobs/_root.d0"), "nodes", "africa"
    )
    assert rows_of(one_out, "nodes", "europe/germany")  # non-vacuous


def test_orphan_parent_does_not_clobber_root_job(spark, tmp_path):
    """An extract whose parent directory has NO geometry file (reference
    tree has europe/great_britain/england/london/enfield with no london
    geometry) sources from the root in a LATER batch. Its overwrite-mode
    write must not clobber the depth-0 root job's output — regression test
    for the shared jobs/_root dir bug."""
    from osm_history_splitter_spark.model import RELATION_SCHEMA, WAY_SCHEMA
    from osm_history_splitter_spark.plans.catalog import Extract
    from osm_history_splitter_spark.plans.hierarchy import run_hierarchy

    cat = ExtractCatalog(
        [
            Extract.bbox("africa", -20.0, -35.0, 52.0, 37.0),
            # depth-1 name, but "europe" itself has no geometry -> orphan
            Extract.bbox("europe/germany", 5.0, 47.0, 15.0, 55.0),
        ]
    )
    rng = np.random.default_rng(41)
    nodes = spark.createDataFrame(
        [
            (int(i), 1, True, TS, 0, 0, "u", float(lat), float(lon), {})
            for i, (lon, lat) in enumerate(
                zip(rng.uniform(-20, 40, 600), rng.uniform(-35, 65, 600))
            )
        ],
        schema=NODE_SCHEMA,
    )
    ways = spark.createDataFrame([], schema=WAY_SCHEMA)
    rels = spark.createDataFrame([], schema=RELATION_SCHEMA)

    out = str(tmp_path / "orphan")
    manifest = run_hierarchy(spark, nodes, ways, rels, cat, out, mode="softcut")
    # both jobs ran root-sourced, in different batches, to DIFFERENT dirs
    srcs = [j["source"] for j in manifest["jobs"]]
    assert srcs == ["_root.d0", "_root.d1"], srcs
    africa = spark.read.parquet(f"{out}/jobs/_root.d0/nodes").filter(
        F.col("extract") == "africa"
    )
    germany = spark.read.parquet(f"{out}/jobs/_root.d1/nodes").filter(
        F.col("extract") == "europe/germany"
    )
    from osm_history_splitter_spark.operators.spatial_join import (
        assign_extracts as _assign,
    )

    expect_africa = _assign(
        nodes, ExtractCatalog([Extract.bbox("africa", -20.0, -35.0, 52.0, 37.0)])
    )
    assert africa.count() == expect_africa.count() > 0
    assert germany.count() > 0


def test_staged_runner_matches_one_pass_hardcut(spark, tree, tmp_path):
    """Hardcut composes through the hierarchy too: clipping a child from
    the parent's clipped output equals clipping it directly (child refs
    are a subset of parent refs, so the <2-refs drop agrees)."""
    from osm_history_splitter_spark.model import RELATION_SCHEMA, WAY_SCHEMA
    from osm_history_splitter_spark.plans.hierarchy import run_hierarchy
    from osm_history_splitter_spark.splitter import run_split

    sub = ExtractCatalog(
        [e for e in tree if e.name in ("europe", "europe/germany")]
    )
    rng = np.random.default_rng(37)
    nodes = spark.createDataFrame(
        [
            (int(i), 1, True, TS, 0, 0, "u", float(lat), float(lon), {})
            for i, (lon, lat) in enumerate(
                zip(rng.uniform(0, 20, 800), rng.uniform(40, 60, 800))
            )
        ],
        schema=NODE_SCHEMA,
    )
    ways = spark.createDataFrame(
        [(1000 + w, 1, True, TS, 0, 0, "u",
          [int(4 * w), int(4 * w + 1), int(4 * w + 2), int(4 * w + 3)], {})
         for w in range(200)],
        schema=WAY_SCHEMA,
    )
    rels = spark.createDataFrame([], schema=RELATION_SCHEMA)

    one_out = str(tmp_path / "one_hc")
    run_split(spark, nodes, ways, rels, sub, one_out, mode="hardcut")
    staged_out = str(tmp_path / "staged_hc")
    run_hierarchy(spark, nodes, ways, rels, sub, staged_out, mode="hardcut")

    for entity in ("nodes", "ways"):
        one = {
            (r["id"], r["version"])
            for r in spark.read.parquet(f"{one_out}/{entity}")
            .filter(F.col("extract") == "europe/germany").collect()
        }
        staged = {
            (r["id"], r["version"])
            for r in spark.read.parquet(f"{staged_out}/jobs/europe/{entity}")
            .filter(F.col("extract") == "europe/germany").collect()
        }
        assert staged == one, entity
    assert one  # non-vacuous
