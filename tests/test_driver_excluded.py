"""Oracle parity for the driver-EXCLUDED registry entries.

The driver's CORRECTNESS gate certifies at most 50 queries; the entries
folded out of that window (``__spark_entry__._DRIVER_EXCLUDE``) keep
their DuckDB twins here — same multiset compare as tools/selfcheck.py,
so 'folded' never decays into 'untested'. ``bm25_topk`` stays out: its
ln() ulps need the rounded compare in tests/test_bm25.py."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry  # noqa: E402
from osm_history_splitter_spark import oracle_queries as oq  # noqa: E402
from osm_history_splitter_spark import text_queries as tq  # noqa: E402
from tools.selfcheck import TABLES, multiset  # noqa: E402

SF = "/root/testdata/sf0.001"

EXCLUDED = sorted(entry._DRIVER_EXCLUDE - {"bm25_topk"})


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", EXCLUDED)
def test_excluded_query_matches_oracle(spark, con, name):
    fn, sql = {**oq.SPATIAL_QUERIES, **tq.TEXT_QUERIES}[name]
    assert sql is not None, f"{name} has no SQL twin"
    sdf = fn(spark, SF)
    srows, scols = sdf.collect(), sdf.columns
    ores = con.execute(sql)
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) > 0, f"{name} is vacuous at {SF}"
    assert multiset(srows, scols) == multiset(orows, ocols)
