"""Deployability (north_rule: spark-submit --py-files): the built zip is a
self-sufficient import source — a fresh interpreter with ONLY the zip on
sys.path (repo dir removed) runs a split end-to-end."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_pyfiles_zip_runs_split(tmp_path):
    sys.path.insert(0, str(REPO / "tools"))
    from package import build  # tools/package.py

    zip_path = build(out_dir=str(tmp_path / "dist"))
    child = f"""
import sys
sys.path = [p for p in sys.path if not p.rstrip('/').endswith('repo')]
sys.path.insert(0, {str(zip_path)!r})
import osm_history_splitter_spark
assert {str(zip_path)!r} in osm_history_splitter_spark.__file__, \
    osm_history_splitter_spark.__file__
from osm_history_splitter_spark.session import get_spark
from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog
from osm_history_splitter_spark.operators.hardcut import hardcut
spark = get_spark("pkg", cores=2, shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
nodes = spark.createDataFrame(
    [(1, 1, True, 0.5, 0.5), (2, 1, True, 5.0, 5.0)],
    "id long, version int, visible boolean, lon double, lat double")
ways = spark.createDataFrame([], "id long, version int, visible boolean, refs array<long>")
rels = spark.createDataFrame(
    [], "id long, version int, visible boolean, "
    "members array<struct<type:string,ref:long,role:string>>")
cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
res = hardcut(nodes, ways, rels, cat)
got = [(r.id, r.extract) for r in res.nodes.collect()]
assert got == [(1, "t")], got
print("PKG_OK")
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", child], capture_output=True, text=True, timeout=300
    )
    assert "PKG_OK" in out.stdout, out.stdout + out.stderr
