"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship web-pages softcut split at sf0.001;
``queries()``/``oracle_sql()`` expose each implemented operator from
SURVEY.md §2 over the driver's parquet tables, with DuckDB-equivalent SQL.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from osm_history_splitter_spark import oracle_queries as oq  # noqa: E402
from osm_history_splitter_spark import text_queries as tq  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the web-pages softcut split (geotag extraction → spatial
    join → url-level history-complete membership) at sf0.001."""
    return oq.q_pages_split(spark, "/root/testdata/sf0.001")


def _all_queries() -> dict[str, tuple]:
    out: dict[str, tuple] = {}
    out.update(oq.SPATIAL_QUERIES)
    out.update(tq.TEXT_QUERIES)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql
        for name, (_fn, sql) in _all_queries().items()
        if sql is not None
    }
