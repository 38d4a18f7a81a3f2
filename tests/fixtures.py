"""The golden `version-two-node-after` scenario as DataFrames (reference
``test/version-two-node-after.osh`` + ``test/test.config``: one BBOX extract
(-1,-1,1,1), strict edges). Expected memberships documented in FIXTURES.md §6.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession

from osm_history_splitter_spark.model import (
    NODE_SCHEMA,
    RELATION_SCHEMA,
    WAY_SCHEMA,
)
from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog

TS = dt.datetime(2012, 1, 1, 10, 0, 0)


def golden_nodes(spark: SparkSession):
    rows = [
        (1, 1, True, TS, 1000, 100, "me", 10.0, 10.0, {}),
        (1, 2, True, TS, 1000, 100, "me", 20.0, 10.0, {}),
        (2, 1, True, TS, 1000, 100, "me", 10.0, 20.0, {}),
        (2, 2, True, TS, 1000, 100, "me", 20.0, 20.0, {}),
        (3, 1, True, TS, 1000, 100, "me", 0.0, 0.0, {}),
        (3, 2, True, TS, 1000, 100, "me", 0.0, 50.0, {}),
        (4, 1, True, TS, 1000, 100, "me", 80.0, 80.0, {}),
    ]
    return spark.createDataFrame(rows, schema=NODE_SCHEMA)


def golden_ways(spark: SparkSession):
    rows = [
        (10, 1, True, TS, 1000, 100, "me", [1, 2], {}),
        (10, 2, True, TS, 1000, 200, "me", [2, 3], {}),
        (20, 1, True, TS, 1000, 200, "me", [1, 4], {}),
    ]
    return spark.createDataFrame(rows, schema=WAY_SCHEMA)


def golden_relations(spark: SparkSession):
    return spark.createDataFrame([], schema=RELATION_SCHEMA)


def golden_catalog() -> ExtractCatalog:
    return ExtractCatalog([Extract.bbox("test", -1.0, -1.0, 1.0, 1.0)])
