"""Common-Crawl-style pages table (BASELINE.json input_hint):
``(url, warc_ts, html, text, lang)``.

``synth_pages`` derives the table deterministically from the driver's
``documents`` parquet (no external data): three warc snapshots per url, each
carrying a geotag marker in its text (integer wire format, see
``functions.geotags``). The derivation is pure Catalyst arithmetic so the
DuckDB oracle can rebuild the identical table.

Mapping onto the versioned-entity model (SURVEY §1.3): url = object id,
warc_ts = version, geotag = point. Softcut semantics then read: if ANY
snapshot of a url geotags inside an extract, ALL snapshots of that url are
emitted, with byte-identical ``text`` per row (reference ``softcut.hpp:
357-370`` writes the original object; here the original row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["synth_pages", "PAGES_SQL"]

VERSIONS_PER_URL = 3


def synth_pages(
    spark: SparkSession, sf_dir: str, replicate: int = 1, partitions: int | None = None
) -> DataFrame:
    """``replicate`` > 1 deterministically fans every document out to R
    distinct urls (suffixed, geotags shifted per replica) — used to build a
    compute-bound corpus for scaling measurements from the small driver
    tables. ``partitions`` repartitions after the (single-file) parquet
    scan so the fan-out parallelizes."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if replicate > 1:
        d = d.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1)))
        )
        if partitions:
            d = d.repartition(partitions)
        d = d.withColumn(
            "doc_id", F.col("doc_id") * replicate + F.col("rep")
        ).drop("rep")
    elif partitions:
        d = d.repartition(partitions)
    k = F.col("doc_id")
    latc = (k * 37) % 18000 - 9000
    lonc = (k * 53) % 36000 - 18000
    url = F.concat(
        F.lit("https://example.org/p/"),
        F.floor(k / VERSIONS_PER_URL).cast("long").cast("string"),
    )
    text2 = F.concat(
        F.col("text"),
        F.lit(" GEO(latc="),
        latc.cast("string"),
        F.lit(";lonc="),
        lonc.cast("string"),
        F.lit(")"),
    )
    return d.select(
        url.alias("url"),
        (k % VERSIONS_PER_URL).alias("ver"),
        F.to_timestamp(
            F.concat(F.lit("2024-01-0"), (k % VERSIONS_PER_URL + 1).cast("string"))
        ).alias("warc_ts"),
        text2.cast("binary").alias("html"),
        text2.alias("text"),
        F.col("lang"),
    )


# the identical derivation for the DuckDB oracle (ver kept, warc_ts/html
# omitted — timestamps and blobs don't enter compared columns)
PAGES_SQL = f"""SELECT
  'https://example.org/p/' || CAST(CAST(floor(doc_id / {VERSIONS_PER_URL}) AS BIGINT) AS VARCHAR) AS url,
  doc_id % {VERSIONS_PER_URL} AS ver,
  text || ' GEO(latc=' || CAST((doc_id * 37) % 18000 - 9000 AS VARCHAR)
       || ';lonc=' || CAST((doc_id * 53) % 36000 - 18000 AS VARCHAR) || ')' AS text,
  lang
FROM documents"""
