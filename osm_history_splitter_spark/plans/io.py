"""Extract-partitioned writes + lineage/metrics sidecars (reference S8/S9:
per-extract writer fan-out, ``cut.hpp:71-118``; writer finalization,
``cut.hpp:60-65``; per-extract bbox in the output header, ``cut.hpp:99-106``).

One job writes every extract: the membership pipeline computes an
``extract`` column and the write partitions on it — the distributed analog
of the reference's shared-scan/multi-writer design (one read of the input
feeds all extracts, ``splitter.cpp:80``).

Skew: extract sizes are wildly uneven (a planet extract vs a city). A plain
``partitionBy("extract")`` makes one task per extract write all its rows.
We salt the shuffle key — ``repartition(n, extract, salt)`` — so a hot
extract's rows spread over ``salt_buckets`` tasks, then partitionBy lays
files out per extract anyway. The salt is a DETERMINISTIC content hash
(``pmod(xxhash64(row columns), buckets)``), never ``rand()``: a
non-deterministic salt re-draws on shuffle-map task retry, silently
duplicating/dropping rows under executor loss (the SPARK-23207 bug class).
AQE handles residual imbalance.

Lineage/metrics (north_rule): every write emits a JSON sidecar with
per-extract row counts and the extract's bbox (observed inside the write
job itself when a catalog is supplied — no second scan of the output),
the source stage name, and the exact write configuration.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from urllib.parse import unquote

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

__all__ = ["write_extracts", "read_extract"]


def _salt_col(df: DataFrame, salt_buckets: int):
    """Deterministic per-row salt: content hash of every hashable column.
    Map columns are excluded (Spark forbids hashing MapType); id/version/
    coordinate columns dominate the hash anyway."""
    cols = [c for c, t in df.dtypes if not t.startswith("map<")]
    if not cols:  # all-MapType frame: xxhash64() with zero args is invalid
        return F.pmod(F.spark_partition_id().cast("long"), F.lit(salt_buckets))
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt_buckets))


def write_extracts(
    df: DataFrame,
    path: str,
    stage: str = "out",
    salt_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    catalog=None,
) -> dict:
    """Write ``df`` (must carry an ``extract`` column) partitioned by
    extract; returns the lineage/metrics manifest (also written as
    ``<path>/_lineage.json``).

    ``sort_cols`` reproduces the reference's output row order inside each
    partition (O1/O2: type-major, id-minor, version order) via
    ``sortWithinPartitions`` — cheap, no extra shuffle.

    ``catalog`` (an ``ExtractCatalog``), when given, adds per-extract row
    counts and bboxes to the manifest at zero extra cost: counts ride the
    write job as ``observe`` metrics (one conditional-count aggregate per
    extract), bboxes come from the catalog — no post-write scan.
    """
    obs_cols = [F.count(F.lit(1)).alias("rows")]
    names: list[str] = []
    if catalog is not None and len(catalog) > 256:
        # one observe aggregate per extract stops paying off when the
        # expression list itself bloats codegen; huge catalogs use the
        # footer-count fallback below (row-group metadata scan)
        bboxes_only = {
            e.name: [e.minlon, e.minlat, e.maxlon, e.maxlat] for e in catalog
        }
        catalog = None
    else:
        bboxes_only = None
    if catalog is not None:
        names = [e.name for e in catalog]
        obs_cols += [
            F.sum((F.col("extract") == name).cast("long")).alias(f"x{i}")
            for i, name in enumerate(names)
        ]
    obs = Observation(f"write_{stage}")
    # explicit partition count: AQE must not coalesce the salt away — the
    # whole point is >1 writer task per hot extract
    spark = df.sparkSession
    n_part = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")), salt_buckets
    )
    salted = df.repartition(n_part, F.col("extract"), _salt_col(df, salt_buckets))
    if sort_cols:
        salted = salted.sortWithinPartitions("extract", *sort_cols)
    observed = salted.observe(obs, *obs_cols)
    t0 = time.time()
    observed.write.mode(mode).partitionBy("extract").parquet(path)
    wall = time.time() - t0

    try:
        observation = dict(obs.get)
    except Exception:
        # a 0-partition plan (empty LocalRelation) runs no tasks, so the
        # observation row never materializes — the output is empty (the
        # same guard StageStore.save needed for this)
        observation = {}
    n_rows = observation.get("rows", 0)
    if catalog is not None:
        per_extract = {
            name: int(observation.get(f"x{i}") or 0)
            for i, name in enumerate(names)
        }
        bboxes = {
            e.name: [e.minlon, e.minlat, e.maxlon, e.maxlat] for e in catalog
        }
    else:
        # no catalog: fall back to counting from the written footers
        # (row-group metadata scan of the output — cheap, not free)
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
        bboxes = bboxes_only
    # per-partition (file-level) lineage: names + bytes of every written
    # part file, grouped by extract — directory metadata only, no data scan
    files = {}
    root = Path(path)
    if root.exists():
        for part_dir in sorted(root.glob("extract=*")):
            # partition dir values are URL-escaped on disk (europe%2Fgermany)
            # — unquote so keys match per_extract_rows / extract_bbox
            name = unquote(part_dir.name.split("=", 1)[1])
            files[name] = [
                {"file": f.name, "bytes": f.stat().st_size}
                for f in sorted(part_dir.glob("*.parquet"))
            ]
    manifest = {
        "stage": stage,
        "path": path,
        "rows": n_rows,
        "per_extract_rows": per_extract,
        "extract_bbox": bboxes,
        "partition_files": files,
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


def parquet_dir_has_data(spark, path: str) -> bool:
    """True iff ``path`` exists and contains at least one data file
    (ignoring _SUCCESS/.crc markers), checked through the Hadoop
    FileSystem so it works for any supported URI scheme. Callers use
    this instead of letting ``spark.read.parquet`` fail analysis on an
    all-empty ``partitionBy`` output: a failed analysis fires the
    session's ExecutionListenerBus and every registered Observation
    listener logs an ERROR for a condition that is expected."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return False
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        name = it.next().getPath().getName()
        if not (name.startswith("_") or name.startswith(".")):
            return True
    return False
