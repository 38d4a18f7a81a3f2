"""Supplementary benchmarks for the optimization rounds (NOT the frozen
driver bench — see bench.py). Reproduces bench.py's session shape (tmpfs
shuffle dir, same confs, same warmup) so per-query numbers are comparable
with BENCH_r*.json, but times only the query list given on the command
line (all of BENCH_QUERIES when none given). One JSON line on stdout.

Usage: python bench_extra.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from osm_history_splitter_spark import oracle_queries as oq  # noqa: E402
from osm_history_splitter_spark import text_queries as tq  # noqa: E402
from osm_history_splitter_spark.session import get_spark  # noqa: E402


def run(names: list[str], sf_dir: str) -> dict:
    shm = "/dev/shm/splitter_bx_local" if os.path.isdir("/dev/shm") else None
    spark = get_spark(
        "bench-extra",
        extra_conf={"spark.local.dir": shm} if shm else None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    allq = {}
    allq.update(oq.SPATIAL_QUERIES)
    allq.update(tq.TEXT_QUERIES)
    spark.read.parquet(f"{sf_dir}/part.parquet").count()
    allq["pages_split"][0](spark, "/root/testdata/sf0.001").count()
    times, times_warm, rows = {}, {}, {}
    for name in names:
        fn = allq[name][0]
        spark.sparkContext.setJobDescription(f"bx:{name}")
        t0 = time.perf_counter()
        rows[name] = fn(spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        times_warm[name] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    if shm:
        import shutil

        shutil.rmtree(shm, ignore_errors=True)
    return {
        "queries": times,
        "queries_warm": times_warm,
        "rows": rows,
        "total": round(sum(times.values()), 3),
    }


if __name__ == "__main__":
    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or bench.BENCH_QUERIES
    print(json.dumps(run(names, sf_dir)))
