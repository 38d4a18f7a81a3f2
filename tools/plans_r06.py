"""Dump .explain("formatted") for named bench queries to plans/r06/.

Usage: python tools/plans_r06.py <suffix> [query ...]
  suffix: "before" or "after" — file name tag
  with no queries listed, dumps every BENCH_QUERIES entry.

The driver/judge cannot run Spark; these files are the committed evidence
for every plan-shape claim in OPTIMIZATION_r06.md (guide §1/§7.2).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from osm_history_splitter_spark import oracle_queries as oq  # noqa: E402
from osm_history_splitter_spark import text_queries as tq  # noqa: E402
from osm_history_splitter_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(__file__).resolve().parents[1] / "plans" / "r06"
    out_dir.mkdir(parents=True, exist_ok=True)
    allq = {}
    allq.update(oq.SPATIAL_QUERIES)
    allq.update(tq.TEXT_QUERIES)
    import bench

    if not names:
        names = bench.BENCH_QUERIES
    spark = get_spark("plans-r06")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = allq[name][0]
        df = fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
