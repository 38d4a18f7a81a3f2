"""Churn-fraction sensitivity of the CDC marker paths — the empirical
read of the indexed path's O(churn) claim (operators/incremental.py,
SCALE.md "Indexed pass 1").

Runs bench._cdc_speedup's geometry-churn paths (from-scratch `full`,
incremental with full marker recompute `inc`, incremental with indexed
markers `idx`) at several churn fractions over the SAME world, and
prints one JSON line per fraction. What should move and what shouldn't:

- `cdc_full_sec` is churn-independent (same world bytes re-split);
- `cdc_incremental_sec` is nearly churn-independent (the marker
  recompute it pays is O(world) regardless; only the pass-2 commit
  scales with churn);
- `cdc_indexed_sec` scales with churn: PIP / reverse-index lookups /
  subset recompute over churned ids only, on top of a churn-independent
  floor (signature scans + stage-rewrite IO + the local job floor —
  dominant at bench scale, amortized at planet scale).

Usage: python tools/cdc_churn_sweep.py [sf_dir] [mods...]
  sf_dir  default /root/testdata/sf0.1
  mods    churn moduli, default 1000 100 10  (0.1%, 1%, 10%)

Results land in BENCH.md by hand (single-window walls swing ±2-5x under
VM steal — run in a quiet window, best-of SPARK_GRAFT_CDC_REPEAT).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cdc_speedup, get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mods = [int(m) for m in sys.argv[2:]] or [1000, 100, 10]
    spark = get_spark(
        "cdc-churn-sweep",
        extra_conf=(
            {"spark.local.dir": "/dev/shm/splitter_bench_local"}
            if os.path.isdir("/dev/shm")
            else None
        ),
    )
    spark.sparkContext.setLogLevel("ERROR")
    for mod in mods:
        out = _cdc_speedup(
            spark, sf_dir, churn_mod=mod, paths=("full", "inc", "idx")
        )
        out["churn_pct"] = round(100.0 / mod, 3)
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
