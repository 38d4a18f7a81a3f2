"""True spark-submit --py-files deployment test: the real binary, the built
zip as the ONLY code source, the reference config format, parquet in/out."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"  # the real distribution, not the pyenv wrapper


@pytest.mark.skipif(
    not Path(SPARK_SUBMIT).exists(), reason="spark-submit not installed"
)
def test_spark_submit_pyfiles_split(spark, tmp_path):
    # input tables written by the (session-fixture) spark
    nodes = spark.createDataFrame(
        [(1, 1, True, 0.5, 0.5), (1, 2, True, 5.0, 5.0), (2, 1, True, 9.0, 9.0)],
        "id long, version int, visible boolean, lon double, lat double",
    )
    ways = spark.createDataFrame(
        [(10, 1, True, [1, 2])],
        "id long, version int, visible boolean, refs array<long>",
    )
    rels = spark.createDataFrame(
        [], "id long, version int, visible boolean, "
        "members array<struct<type:string,ref:long,role:string>>",
    )
    inp = tmp_path / "in"
    nodes.write.parquet(str(inp / "nodes"))
    ways.write.parquet(str(inp / "ways"))
    rels.write.parquet(str(inp / "relations"))
    cfg = tmp_path / "split.config"
    cfg.write_text("box.parquet BBOX -1,-1,2,2\n")

    sys.path.insert(0, str(REPO / "tools"))
    from package import build

    zip_path = build(out_dir=str(tmp_path / "dist"))
    out = tmp_path / "out"
    proc = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=2",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            str(REPO / "tools" / "run_split.py"),
            "--input", str(inp), "--config", str(cfg),
            "--output", str(out), "--mode", "softcut",
        ],
        capture_output=True, text=True, timeout=480,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root",
             "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", ""),
             "SPARK_HOME": "/opt/spark",
             "PYSPARK_PYTHON": sys.executable,
             "PYSPARK_DRIVER_PYTHON": sys.executable,
             "SPARK_GRAFT_CPUS": "2"},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    manifest = json.loads(proc.stdout[proc.stdout.index("{"):])
    assert manifest["nodes"]["rows"] == 3  # ids 1 (all versions) + 2? no: 1v1 in box -> id 1 both versions; node 2 via way ref
    got = {
        (r["id"], r["version"])
        for r in spark.read.parquet(str(out / "nodes")).collect()
    }
    assert got == {(1, 1), (1, 2), (2, 1)}
