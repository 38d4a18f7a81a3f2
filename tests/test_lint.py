"""Engine-wide static rules: the 'no per-row Python on the data plane'
discipline is enforced mechanically, not by convention."""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "osm_history_splitter_spark"


def _sources():
    return sorted(PKG.rglob("*.py"))


def test_no_row_at_a_time_udf():
    """``F.udf(`` / ``@udf`` is the row-at-a-time Python path — banned.
    Vectorized ``pandas_udf`` / ``mapInPandas`` are the allowed escapes."""
    offenders = []
    for p in _sources():
        src = p.read_text()
        if re.search(r"\bF\.udf\(|^\s*@udf\b|[^_s]\budf\(", src, re.M):
            offenders.append(str(p))
    assert not offenders, offenders


def test_no_driver_collect_in_operators():
    """collect()/toPandas() on operator hot paths must be justified inline
    (bounded metadata) — every call site carries a 'bounded' marker word."""
    allowed = re.compile(
        r"(bounded|tiny|metadata|fast path|driver-side|post-aggregation)",
        re.I,
    )
    offenders = []
    for p in (PKG / "operators").rglob("*.py"):
        lines = p.read_text().splitlines()
        for i, ln in enumerate(lines):
            if ".collect()" in ln or ".toPandas()" in ln:
                ctx = "\n".join(lines[max(0, i - 6) : i + 2])
                if not allowed.search(ctx):
                    offenders.append(f"{p}:{i + 1}")
    assert not offenders, offenders
