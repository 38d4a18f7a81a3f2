"""Extract-partitioned writes + lineage/metrics sidecars (reference S8/S9:
per-extract writer fan-out, ``cut.hpp:71-118``; writer finalization,
``cut.hpp:60-65``).

One job writes every extract: the membership pipeline computes an
``extract`` column and the write partitions on it — the distributed analog
of the reference's shared-scan/multi-writer design (one read of the input
feeds all extracts, ``splitter.cpp:80``).

Skew: extract sizes are wildly uneven (a planet extract vs a city). A plain
``partitionBy("extract")`` makes one task per extract write all its rows.
We salt the shuffle key — ``repartition(n, extract, salt)`` — so a hot
extract's rows spread over ``salt_buckets`` tasks, then partitionBy lays
files out per extract anyway. This is the explicit hot-key defusal the
north_rule asks for; AQE handles residual imbalance.

Lineage/metrics (north_rule): every write emits a JSON sidecar with
per-extract row counts (collected via ``observe`` — no second scan), the
source stage name, and the exact write configuration.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

__all__ = ["write_extracts", "read_extract"]


def write_extracts(
    df: DataFrame,
    path: str,
    stage: str = "out",
    salt_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` (must carry an ``extract`` column) partitioned by
    extract; returns the lineage/metrics manifest (also written as
    ``<path>/_lineage.json``).

    ``sort_cols`` reproduces the reference's output row order inside each
    partition (O1/O2: type-major, id-minor, version order) via
    ``sortWithinPartitions`` — cheap, no extra shuffle.
    """
    obs = Observation(f"write_{stage}")
    # explicit partition count: AQE must not coalesce the salt away — the
    # whole point is >1 writer task per hot extract
    spark = df.sparkSession
    n_part = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")), salt_buckets
    )
    salted = df.repartition(
        n_part, F.col("extract"), (F.rand(seed=42) * salt_buckets).cast("int")
    )
    if sort_cols:
        salted = salted.sortWithinPartitions("extract", *sort_cols)
    observed = salted.observe(obs, F.count(F.lit(1)).alias("rows"))
    t0 = time.time()
    observed.write.mode(mode).partitionBy("extract").parquet(path)
    wall = time.time() - t0

    # per-extract counts from the written footers (metadata-only scan);
    # an all-empty result writes no files -> nothing to read back
    n_rows = obs.get["rows"]
    per_extract = (
        {
            r["extract"]: r["n"]
            for r in spark.read.parquet(path)
            .groupBy("extract")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if n_rows
        else {}
    )
    manifest = {
        "stage": stage,
        "path": path,
        "rows": obs.get["rows"],
        "per_extract_rows": per_extract,
        "salt_buckets": salt_buckets,
        "wall_sec": round(wall, 3),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    Path(path, "_lineage.json").write_text(json.dumps(manifest, indent=2))
    return manifest


def read_extract(spark, path: str, extract: str) -> DataFrame:
    """Read one extract partition (partition pruning via the filter —
    Catalyst prunes directories, no full scan)."""
    return spark.read.parquet(path).filter(F.col("extract") == extract)
