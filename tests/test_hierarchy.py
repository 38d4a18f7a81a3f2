"""J7: one-pass multi-level assignment == staged parent-then-child splits,
over the reference's real clipbounds tree."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

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
