"""Mimic the driver's correctness gate locally: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet dir, compare
row-count + (order-insensitive) value multiset.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import datetime as dt
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    return repr(v)


def multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from osm_history_splitter_spark.session import get_spark

    spark = get_spark("selfcheck", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    osql = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in osql:
            print(f"{name:28s} rows-only: {len(srows)} rows")
            continue
        try:
            ores = con.execute(osql[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            print(f"{name:28s} ORACLE ERROR: {e}")
            failures.append(name)
            continue
        sm, om = multiset(srows, scols), multiset(orows, ocols)
        status = "OK" if sm == om else "MISMATCH"
        # Driver-style type sensitivity: DuckDB SUM(BIGINT)->HUGEINT diverges
        # from Spark LongType even when values match. Flag any HUGEINT /
        # DECIMAL in the oracle result or Spark schema mismatch on int width.
        otypes = [str(d[1]) for d in ores.description]
        bad = [
            (ocols[i], otypes[i])
            for i in range(len(otypes))
            if "HUGEINT" in otypes[i].upper() or "INT128" in otypes[i].upper()
        ]
        if bad:
            status += f" (TYPE: oracle HUGEINT cols {bad} vs Spark long)"
            failures.append(name)
        if sorted(scols) != sorted(c.lower() for c in ocols) and sorted(
            c.lower() for c in scols
        ) != sorted(c.lower() for c in ocols):
            status += " (COLS: %s vs %s)" % (scols, ocols)
        print(f"{name:28s} {status}  spark={len(srows)} oracle={len(orows)}")
        if sm != om:
            failures.append(name)
            sset, oset = set(sm), set(om)
            for x in list(sset - oset)[:5]:
                print("   spark-only:", x)
            for x in list(oset - sset)[:5]:
                print("   oracle-only:", x)
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checked queries OK")


if __name__ == "__main__":
    main()
