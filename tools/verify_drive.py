"""One-command verify drive (the recipe in .claude/skills/verify): golden
softcut/hardcut semantics on the fixture world, the driver contract
(entry/queries/oracle_sql), and one Spark-vs-DuckDB oracle spot-check.

Usage: python tools/verify_drive.py
"""

from __future__ import annotations

import datetime as dt
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from osm_history_splitter_spark.model import (
        NODE_SCHEMA,
        RELATION_SCHEMA,
        WAY_SCHEMA,
    )
    from osm_history_splitter_spark.operators.hardcut import hardcut
    from osm_history_splitter_spark.operators.softcut import softcut
    from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog
    from osm_history_splitter_spark.session import get_spark

    spark = get_spark("verify", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    ts = dt.datetime(2020, 1, 1)
    nodes = spark.createDataFrame(
        [
            (1, 1, True, ts, 0, 0, "u", 0.5, 0.5, {}),
            (1, 2, True, ts, 0, 0, "u", 5.0, 5.0, {}),
            (2, 1, True, ts, 0, 0, "u", 5.0, 5.0, {}),
            (2, 2, True, ts, 0, 0, "u", 0.6, 0.6, {}),
            (3, 1, True, ts, 0, 0, "u", 0.0, 0.0, {}),
            (3, 2, True, ts, 0, 0, "u", 9.0, 9.0, {}),
            (4, 1, True, ts, 0, 0, "u", 8.0, 8.0, {}),
        ],
        schema=NODE_SCHEMA,
    )
    ways = spark.createDataFrame(
        [
            (10, 1, True, ts, 0, 0, "u", [1, 2], {}),
            (10, 2, True, ts, 0, 0, "u", [1, 2], {}),
            (11, 1, True, ts, 0, 0, "u", [4], {}),
        ],
        schema=WAY_SCHEMA,
    )
    rels = spark.createDataFrame([], schema=RELATION_SCHEMA)
    cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])

    sc = softcut(nodes, ways, rels, cat)
    got_n = sorted((r["id"], r["version"]) for r in sc.nodes.collect())
    got_w = sorted((r["id"], r["version"]) for r in sc.ways.collect())
    assert got_n == [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2)], got_n
    assert got_w == [(10, 1), (10, 2)], got_w
    hc = hardcut(nodes, ways, rels, cat)
    hn = sorted((r["id"], r["version"]) for r in hc.nodes.collect())
    assert hn == [(1, 1), (2, 2), (3, 1)], hn
    print("golden softcut/hardcut OK")

    import __spark_entry__ as e

    df = e.entry(spark)
    n = df.count()
    assert n > 0, "entry() returned no rows"
    qs, osql = e.queries(), e.oracle_sql()
    print(f"entry rows: {n}; queries: {len(qs)}; oracles: {len(osql)}")

    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.01/{t}.parquet')"
        )
    name = "node_membership"
    got = qs[name](spark, "/root/testdata/sf0.01").count()
    want = con.execute(f"SELECT count(*) FROM ({osql[name]})").fetchone()[0]
    assert got == want, (name, got, want)
    print(f"oracle spot-check {name}: {got} == {want} OK")

    # round-5 surfaces: CDC (merge-on-read + signature reuse) end-to-end
    import tempfile

    from osm_history_splitter_spark.plans.table import VersionedTable
    from osm_history_splitter_spark.splitter import (
        incremental_resplit,
        run_split,
    )

    td = tempfile.mkdtemp()
    cat2 = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        [(i, v, True, ts, 0, 0, "u", p, p, {}) for i, v, p in rows],
        NODE_SCHEMA,
    )
    empty_w = spark.createDataFrame([], WAY_SCHEMA)
    empty_r = spark.createDataFrame([], RELATION_SCHEMA)
    run_split(
        spark, mk([(i, 1, 0.5) for i in range(10)]), empty_w, empty_r,
        cat2, f"{td}/o1", mode="softcut",
        checkpoint_dir=f"{td}/ck1", publish_table=f"{td}/pub",
    )
    rep = incremental_resplit(
        spark,
        mk([(i, 1, 0.5) for i in range(10)] + [(4, 2, 0.5)]),
        empty_w, empty_r, cat2,
        f"{td}/pub", f"{td}/ck1", f"{td}/ck2",
    )
    assert rep["ways"]["affected_ids"] == 0  # signature reuse fired
    assert rep["nodes"]["affected_ids"] == 1
    t2 = VersionedTable(spark, f"{td}/pub/nodes")
    assert t2._manifest(t2.versions()[-1]).get("deletes")  # MOR commit
    got_ids = {(r["id"], r["version"]) for r in t2.read().collect()}
    assert (4, 2) in got_ids and len(got_ids) == 11
    feed = t2.changes(since=1)
    # only the affected id's rows rode the CDC commit — BOTH its versions
    # (pass 2 is history-complete per id), nothing else
    assert {
        (r["id"], r["version"]) for r in feed.collect()
    } == {(4, 1), (4, 2)}
    print("CDC drive OK (MOR commit + signature reuse + change feed)")

    # streaming half of the CDF: the feed source replays the same commits
    q = (
        t2.stream_changes()
        .writeStream.format("memory")
        .queryName("verify_feed")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        ns, nb = spark.table("verify_feed").count(), t2.changes(0).count()
        assert ns == nb, (ns, nb)
    finally:
        q.stop()
    print(f"streaming change feed OK ({ns} rows == batch)")

    # crawl-container roundtrip: pages -> per-extract WARC+WET -> pages
    import shutil
    import tempfile

    from osm_history_splitter_spark.oracle_queries import catalog
    from osm_history_splitter_spark.sources.pages import synth_pages
    from osm_history_splitter_spark.sources.warc import (
        read_pages,
        split_pages_to_warc,
    )

    pages = synth_pages(spark, "/root/testdata/sf0.001")
    tmp = tempfile.mkdtemp(prefix="verify_warc_")
    try:
        res = split_pages_to_warc(spark, pages, catalog(), tmp, partitions=2)
        back = sum(
            read_pages(spark, f"{tmp}/{e}").count() for e in res["groups"]
        )
        assert back == res["records"], (back, res["records"])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(
        f"WARC split drive OK ({res['records']} records, "
        f"{len(res['groups'])} extracts, roundtrip counts match)"
    )


if __name__ == "__main__":
    main()
