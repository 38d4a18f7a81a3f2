"""Scaling-efficiency evidence (north_rule): run the identical pages-split
job at two parallelism levels (local[8] vs local[32]) on the same input and
report throughput at both + efficiency = (thr_32 / thr_8) / 4.

No real cluster exists in this sandbox; parallelism level stands in for
executor count (BASELINE.md). Each level runs in a fresh subprocess so JVM
state can't leak between measurements.

Usage: python tools/scaling.py [sf_dir] [reps]
Writes/updates BENCH.md.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from osm_history_splitter_spark import oracle_queries as oq
from osm_history_splitter_spark.session import get_spark
spark = get_spark("scaling", cores={cores})
spark.sparkContext.setLogLevel("ERROR")
sf_dir = {sf_dir!r}
# warm-up run (JVM JIT + parquet footers), then timed reps
oq.q_pages_split(spark, sf_dir).count()
best = None
for _ in range({reps}):
    t0 = time.perf_counter()
    n = oq.q_pages_split(spark, sf_dir).count()
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
docs = spark.read.parquet(f"{{sf_dir}}/documents.parquet").count()
print(json.dumps({{"cores": {cores}, "sec": round(best, 3),
                   "docs": docs, "docs_per_sec": round(docs / best, 1)}}))
spark.stop()
"""


def measure(cores: int, sf_dir: str, reps: int) -> dict:
    code = CHILD.format(repo=str(REPO), cores=cores, sf_dir=sf_dir, reps=reps)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lo = measure(8, sf_dir, reps)
    hi = measure(32, sf_dir, reps)
    eff = round((hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0, 3)
    result = {"sf_dir": sf_dir, "local8": lo, "local32": hi, "scaling_efficiency_n_to_4n": eff}
    print(json.dumps(result))
    md = f"""# BENCH — throughput + N→4N scaling evidence

Same pages-split job (geotag extract → cell-cover spatial join → url-level
softcut membership) on identical input ({sf_dir}), two parallelism levels,
fresh JVM per level, best of {reps} timed reps after one warm-up:

| parallelism | wall (s) | docs/sec |
|---|---|---|
| local[8]  (N)  | {lo['sec']} | {lo['docs_per_sec']} |
| local[32] (4N) | {hi['sec']} | {hi['docs_per_sec']} |

**Scaling efficiency (N→4N) = (thr_4N / thr_N) / 4 = {eff}** (target ≥ 0.8
per BASELINE.json; measured via parallelism levels — no real cluster in this
sandbox).

Reference throughput baseline: the reference publishes no docs/sec numbers
(BASELINE.md); its single-node planet splits are I/O-bound single-threaded
streams. The engine's sf0.1 suite timings are in BENCH_r*.json.
"""
    (REPO / "BENCH.md").write_text(md)


if __name__ == "__main__":
    main()
