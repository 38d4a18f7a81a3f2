"""Checkpoint/resume manifest (north_rule: "resumable from checkpoint
mid-split").

The softcut DAG has natural resume points: the membership marker tables
between pass 1 and pass 2 (the role the in-memory bitsets play in the
reference, ``softcut.hpp:70-79`` — ours persist and survive a driver
crash). Each stage writes parquet + a ``_DONE`` marker holding row count,
schema and timestamp; a resumed run reuses any stage whose marker exists
and recomputes the rest. Parquet writes are atomic-enough here (job-level
``_SUCCESS`` + our marker written after); on Iceberg these become snapshot
commits.

Bucketing (the 100-TB pass-2 strategy, ``softcut.hpp`` bitsets →
``growing_bitset.hpp:48-65`` O(1) probes): with ``bucket_by=(col, n)``,
stages carrying ``col`` are written as bucketed+sorted tables, so every
downstream join on ``col`` reads the marker side pre-partitioned — NO
Exchange on the marker side of the pass-2 joins. At planet scale the
marker tables are billions of rows; shuffling them once at write time
(where a shuffle already happens for ``distinct()``) instead of once per
output join is the difference the reference gets for free from its
in-memory bitsets.
"""

from __future__ import annotations

import hashlib
import json
import re
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["StageStore"]


class StageStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        bucket_by: tuple[str, int] | None = None,
    ):
        """``bucket_by=(col, n)``: stages whose schema contains ``col`` are
        saved as bucketed tables (``bucketBy(n, col).sortBy(col)``); loads
        return the catalog table so joins on ``col`` see the bucketing."""
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.bucket_by = bucket_by
        digest = hashlib.md5(str(self.root.resolve()).encode()).hexdigest()[:10]
        self._tbl_prefix = f"ckpt_{digest}_"

    def _marker(self, name: str) -> Path:
        return self.root / f"{name}._DONE"

    def _table(self, name: str) -> str:
        # a short digest of the RAW name keeps sanitized collisions apart
        # ('markers-a' vs 'markers.a' must not hijack each other's table)
        tag = hashlib.md5(name.encode()).hexdigest()[:6]
        return (
            self._tbl_prefix
            + re.sub(r"[^a-z0-9_]", "_", name.lower())
            + f"_{tag}"
        )

    def has(self, name: str) -> bool:
        return self._marker(name).exists()

    def _meta(self, name: str) -> dict:
        return json.loads(self._marker(name).read_text()) if self.has(name) else {}

    def load(self, name: str) -> DataFrame:
        path = str(self.root / name)
        meta = self._meta(name)
        if meta.get("buckets"):
            tbl = self._table(name)
            if not self.spark.catalog.tableExists(tbl):
                # fresh-session resume: re-register the external bucketed
                # table so the files' bucketing is visible to the planner
                self._register(tbl, path, meta)
            return self.spark.table(tbl)
        if meta and meta.get("rows") == 0 and not any(
            Path(path).glob("*.parquet")
        ):
            # an all-empty stage leaves no files; rebuild from recorded schema
            schema = T.StructType.fromJson(meta["schema"])
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(path)

    def load_plain(self, name: str) -> DataFrame:
        """Load a stage WITHOUT bucket metadata (a plain parquet scan).

        Needed when UNIONING two bucketed stages before an aggregate:
        Spark (4.1) lets a Union of same-bucketed scans satisfy the
        aggregate's clustered-distribution requirement WITHOUT aligning
        bucket partitions, so ``distinct()`` over such a union silently
        keeps cross-table duplicates (observed locally; test
        test_union_of_bucketed_tables_distinct_needs_plain_scan pins it).
        A plain scan reports no partitioning, forcing the correct Exchange.
        """
        path = str(self.root / name)
        meta = self._meta(name)
        if meta and meta.get("rows") == 0 and not any(Path(path).glob("*.parquet")):
            return self.spark.createDataFrame(
                [], T.StructType.fromJson(meta["schema"])
            )
        return self.spark.read.parquet(path)

    def _register(self, tbl: str, path: str, meta: dict) -> None:
        schema = T.StructType.fromJson(meta["schema"])
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        col, n = meta["bucket_col"], meta["buckets"]
        self.spark.sql(
            f"CREATE TABLE {tbl} ({cols}) USING PARQUET "
            f"CLUSTERED BY (`{col}`) SORTED BY (`{col}`) INTO {n} BUCKETS "
            f"LOCATION '{path}'"
        )

    def save(self, name: str, df: DataFrame) -> DataFrame:
        """Materialize a stage; returns the re-read DataFrame (so downstream
        plans read the checkpoint — lineage cut, bucketing visible)."""
        path = str(self.root / name)
        # row count rides the write job itself (observe) — a marker table at
        # planet scale is billions of rows; no second scan for metadata
        obs = Observation(f"ckpt_{name}")
        observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        bcol = self.bucket_by[0] if self.bucket_by else None
        bucketed = bool(bcol and bcol in df.columns)
        if bucketed:
            n = self.bucket_by[1]
            tbl = self._table(name)
            self.spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            if Path(path).exists():  # dropping an EXTERNAL table keeps files
                shutil.rmtree(path)
            # pre-shuffle by the bucket column so each task holds exactly one
            # bucket (repartition and bucketBy share Murmur3 hashing) — n
            # files, not tasks×buckets
            (
                observed.repartition(n, F.col(bcol))
                .write.bucketBy(n, bcol)
                .sortBy(bcol)
                .option("path", path)
                .mode("overwrite")
                .saveAsTable(tbl)
            )
        else:
            observed.write.mode("overwrite").parquet(path)
        try:
            n_rows = obs.get["rows"]
        except Exception:
            # a 0-partition plan (empty LocalRelation) runs no tasks, so the
            # observation row never materializes — the stage is empty
            n_rows = 0
        self._marker(name).write_text(
            json.dumps(
                {
                    "rows": n_rows,
                    "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    "schema": df.schema.jsonValue(),
                    "bucket_col": bcol if bucketed else None,
                    "buckets": self.bucket_by[1] if bucketed else None,
                }
            )
        )
        return self.load(name)

    def adopt(self, name: str, other: "StageStore") -> DataFrame:
        """Carry a finished stage over from another store: a driver-side
        file copy of the stage directory + its _DONE marker — NO Spark
        job. Used by incremental re-split for marker stages whose inputs
        provably did not change between ticks (world-signature equality;
        splitter.incremental_resplit). Returns the loaded stage."""
        if not other.has(name):
            raise FileNotFoundError(f"cannot adopt unfinished stage {name}")
        src, dst = other.root / name, self.root / name
        tbl = self._table(name)
        self.spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        if dst.exists():
            shutil.rmtree(dst)
        if src.exists():
            shutil.copytree(src, dst)
        self._marker(name).write_text(other._marker(name).read_text())
        return self.load(name)

    def get_or_compute(self, name: str, compute) -> DataFrame:
        """Resume point: reuse the stage if its marker exists, else compute
        and persist it."""
        if self.has(name):
            return self.load(name)
        return self.save(name, compute())

    def manifest(self) -> dict:
        out = {}
        for m in sorted(self.root.glob("*._DONE")):
            meta = json.loads(m.read_text())
            meta.pop("schema", None)  # bulky, derivable from the files
            out[m.name[: -len("._DONE")]] = meta
        return out
