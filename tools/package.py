"""Build the --py-files artifact for spark-submit deployment (north_rule):

    python tools/package.py                # -> dist/osm_history_splitter_spark.zip
    spark-submit --py-files dist/osm_history_splitter_spark.zip \
        osm_history_splitter_spark/splitter.py --input ... --config ... --output ...
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def build(out_dir: str = "dist") -> Path:
    dist = REPO / out_dir
    dist.mkdir(exist_ok=True)
    target = dist / "osm_history_splitter_spark.zip"
    pkg = REPO / "osm_history_splitter_spark"
    with zipfile.ZipFile(target, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    return target


if __name__ == "__main__":
    print(build())
