"""spark-submit CLI for the web-pages split — the webtext twin of
``splitter.main`` (reference CLI surface: ``splitter.cpp:main`` reads a
config of extracts and emits one output container per extract;
``cut.hpp:73-74`` picks the format per dest).

Input is either a pages parquet file/dir (``(url, warc_ts, html, text,
lang)``) or a WARC+WET crawl directory (detected by ``*.warc.gz``
presence; rebuilt via ``sources.warc.read_pages``). Extracts come from
the same config format the OSM CLI uses (BBOX/POLY lines). Output is
one WARC+WET directory per extract — the crawl's own container format —
written by ONE distributed job, plus an optional VersionedTable commit
of the membership rows (``--publish-table``) so downstream consumers
can follow splits through the change feed instead of re-reading
containers.

Usage::

    spark-submit --py-files pkg.zip -m osm_history_splitter_spark.pages_cli \\
        --input crawl_dir_or_parquet --config extracts.config --output out/

Prints one JSON manifest line (records per extract, files, published
version) — the lineage convention every sink in this repo follows.
"""

from __future__ import annotations

import argparse
import glob
import json


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--input", required=True,
        help="pages parquet path OR a WARC+WET crawl directory",
    )
    ap.add_argument("--config", required=True, help="extract config file")
    ap.add_argument("--output", required=True, help="per-extract WARC output dir")
    ap.add_argument(
        "--partitions", type=int, default=4,
        help="range partitions (≈ output files per extract group)",
    )
    ap.add_argument(
        "--no-wet", action="store_true",
        help="emit only *.warc.gz (skip the extracted-text WET twin)",
    )
    ap.add_argument(
        "--publish-table", default=None, metavar="DIR",
        help="also commit membership rows (url, warc_ts, extract, lang) "
        "to a VersionedTable at DIR (merge by key — re-splits stay "
        "time-travelable)",
    )
    args = ap.parse_args()
    if args.publish_table and args.no_wet:
        ap.error("--publish-table reads lang from the WET twin; drop --no-wet")

    from pyspark.sql import functions as F

    from .session import get_spark
    from .sources.config import parse_config
    from .sources.warc import read_pages, split_pages_to_warc

    spark = get_spark("pages-split")
    catalog = parse_config(args.config)
    if glob.glob(f"{args.input}/*.warc.gz"):
        pages = read_pages(spark, args.input)
    else:
        pages = spark.read.parquet(args.input)

    manifest = split_pages_to_warc(
        spark,
        pages,
        catalog,
        args.output,
        partitions=args.partitions,
        wet=not args.no_wet,
    )

    if args.publish_table:
        from .plans.table import VersionedTable

        # a config whose extracts matched nothing still publishes a clean
        # EMPTY version (never commit(None)) — consumers see "the split
        # ran and selected zero rows", not a crash after the split work
        members = spark.createDataFrame(
            [], "url string, warc_ts timestamp, extract string, lang string"
        )
        for ext in manifest["groups"]:
            part = read_pages(spark, f"{args.output}/{ext}").select(
                "url", "warc_ts", F.lit(ext).alias("extract"), "lang"
            )
            members = members.unionByName(part)
        t = VersionedTable(spark, args.publish_table)
        v = t.commit(
            members,
            mode="merge" if t.versions() else "append",
            merge_key=["url", "warc_ts", "extract"],
        )
        manifest["published_version"] = v

    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
