"""Checkpoint/resume manifest (north_rule: "resumable from checkpoint
mid-split").

The softcut DAG has natural resume points: the four membership marker
tables between pass 1 and pass 2 (the role the in-memory bitsets play in
the reference, ``softcut.hpp:70-79`` — ours persist and survive a driver
crash). Each stage writes parquet + a ``_DONE`` marker holding row count
and timestamp; a resumed run reuses any stage whose marker exists and
recomputes the rest. Parquet writes are atomic-enough here (job-level
``_SUCCESS`` + our marker written after); on Iceberg these become snapshot
commits.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

__all__ = ["StageStore"]


class StageStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _marker(self, name: str) -> Path:
        return self.root / f"{name}._DONE"

    def has(self, name: str) -> bool:
        return self._marker(name).exists()

    def load(self, name: str) -> DataFrame:
        return self.spark.read.parquet(str(self.root / name))

    def save(self, name: str, df: DataFrame) -> DataFrame:
        """Materialize a stage; returns the re-read DataFrame (so downstream
        plans read the checkpoint, cutting lineage)."""
        path = str(self.root / name)
        # row count rides the write job itself (observe) — a marker table at
        # planet scale is billions of rows; no second scan for metadata
        obs = Observation(f"ckpt_{name}")
        df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite"
        ).parquet(path)
        n = obs.get["rows"]
        self._marker(name).write_text(
            json.dumps(
                {"rows": n, "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
            )
        )
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
            out[m.name[: -len("._DONE")]] = json.loads(m.read_text())
        return out
