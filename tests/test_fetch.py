"""Planet fetch-and-split orchestration (reference
``tools/fetch-and-split.php``), exercised fully offline against a
``file://`` mirror built from the reference's own fixture."""

from __future__ import annotations

import hashlib
import shutil
from pathlib import Path

import pytest

from osm_history_splitter_spark.fetch import (
    discover_newest,
    fetch_and_split,
    fetch_verified,
)
from osm_history_splitter_spark.sources.osm_xml import load_osm_dataframes

REF = "/root/reference"
FIXTURE = f"{REF}/test/version-two-node-after.osh"


def _mirror(tmp_path, date="2020-01-01") -> tuple[str, Path]:
    """A local planet mirror: index page + dump + md5 sidecar."""
    m = tmp_path / "mirror"
    m.mkdir()
    name = f"history-{date}.osm.xml"
    shutil.copy(FIXTURE, m / name)
    digest = hashlib.md5((m / name).read_bytes()).hexdigest()
    (m / f"{name}.md5").write_text(f"{digest}  {name}\n")
    # urllib serves file:// dirs; the orchestrator appends ?C=M;O=D which
    # file:// ignores — emulate the listing as the index the regex scans
    (m / "index.html").write_text(f'<a href="{name}">{name}</a>')
    return f"file://{m}", m


def test_discover_newest_matches_reference_regex():
    html = '<a href="history-2021-03-29.osm.pbf">x</a> <a href="history-2020-01-01.osm.pbf">y</a>'
    assert discover_newest(html) == ("history-2021-03-29.osm.pbf", "2021-03-29")
    with pytest.raises(ValueError):
        discover_newest("<html>nothing here</html>")


def test_fetch_verified_skips_existing_and_rejects_corrupt(tmp_path):
    base, m = _mirror(tmp_path)
    name = "history-2020-01-01.osm.xml"
    dest = tmp_path / "dl"
    p = fetch_verified(base, name, dest)
    assert p.read_bytes() == (m / name).read_bytes()
    # wget -nc semantics: an existing file is not re-downloaded
    p.write_bytes(p.read_bytes())  # touch
    before = p.stat().st_mtime_ns
    assert fetch_verified(base, name, dest) == p
    assert p.stat().st_mtime_ns == before
    # corrupt sidecar → delete + raise (cron retry re-fetches)
    (m / f"{name}.md5").write_text("deadbeef  x\n")
    with pytest.raises(ValueError, match="md5 mismatch"):
        fetch_verified(base, name, dest)
    assert not p.exists()


def _loader(spark, dump_path):
    return load_osm_dataframes(spark, dump_path)


def _patched_listing(monkeypatch, mirror_dir):
    """file:// has no ?C=M;O=D listing — route the index read to the
    mirror's index.html, everything else to the real URL."""
    import osm_history_splitter_spark.fetch as fetch_mod

    real = fetch_mod._read_url

    def fake(url):
        if url.endswith("?C=M;O=D"):
            return (mirror_dir / "index.html").read_bytes()
        return real(url)

    monkeypatch.setattr(fetch_mod, "_read_url", fake)


def test_fetch_and_split_tick_then_idempotent_skip(spark, tmp_path, monkeypatch):
    base, m = _mirror(tmp_path)
    _patched_listing(monkeypatch, m)
    work = tmp_path / "work"
    work.mkdir()
    shutil.copy(f"{REF}/test/test.config", work / "test.config")
    # the reference config's POLY/OSM-free bbox line resolves standalone
    report = fetch_and_split(spark, base, str(work), _loader)
    assert report["skipped"] is False and report["date"] == "2020-01-01"
    assert report["splits"]["test"] == {"nodes": 6, "ways": 2, "relations": 0}
    out = work / "extracts" / "2020-01-01" / "test"
    assert (out / "_manifest.json").exists()
    assert (work / "extracts" / "latest").resolve().name == "2020-01-01"
    assert (work / "extracts" / "latest-stamp").read_text() == "2020-01-01"
    # second tick: same dump on the mirror → no work (cron-safe)
    report2 = fetch_and_split(spark, base, str(work), _loader)
    assert report2 == {
        "skipped": True, "date": "2020-01-01",
        "remote": "history-2020-01-01.osm.xml",
    }


def test_new_dump_triggers_resplit_and_stamp_flip(spark, tmp_path, monkeypatch):
    base, m = _mirror(tmp_path)
    _patched_listing(monkeypatch, m)
    work = tmp_path / "work"
    work.mkdir()
    shutil.copy(f"{REF}/test/test.config", work / "test.config")
    fetch_and_split(spark, base, str(work), _loader)
    # mirror publishes a newer dump
    name2 = "history-2020-02-02.osm.xml"
    shutil.copy(FIXTURE, m / name2)
    d = hashlib.md5((m / name2).read_bytes()).hexdigest()
    (m / f"{name2}.md5").write_text(f"{d}  {name2}\n")
    (m / "index.html").write_text(
        f'<a href="{name2}">{name2}</a> '
        f'<a href="history-2020-01-01.osm.xml">old</a>'
    )
    report = fetch_and_split(spark, base, str(work), _loader)
    assert report["skipped"] is False and report["date"] == "2020-02-02"
    assert (work / "extracts" / "latest").resolve().name == "2020-02-02"
    # both date dirs exist: old extracts are kept, the symlink moves
    assert (work / "extracts" / "2020-01-01" / "test").exists()
    # superseded DUMPS are pruned (each is ~100 GB at planet scale);
    # the current dump and its md5 stay
    names = {p.name for p in (work / "full-history").iterdir()}
    assert names == {name2}  # (the md5 sidecar is verified in-stream)
    assert "history-2020-01-01.osm.xml" in report["pruned_dumps"]


def test_continuous_incremental_fetch_service(spark, tmp_path, monkeypatch):
    """incremental=True: tick 1 = full split + publish; the mirror
    publishes an updated dump; tick 2 diffs against tick 1's checkpoint
    and commits only the change — the published table carries both
    dump states, time-travelable."""
    import datetime as dt

    from osm_history_splitter_spark.plans.table import VersionedTable
    from osm_history_splitter_spark.sources.pbf import (
        encode_data_blob,
        encode_header_blob,
    )

    ts = dt.datetime(2020, 1, 1)

    def dump_bytes(with_update):
        nodes = [
            (i, 1, True, ts, 1, 1, "u", 0.5, 0.5, {}) for i in range(8)
        ]
        if with_update:
            nodes.append((0, 2, True, ts, 1, 1, "u", 0.6, 0.6, {}))
        return encode_header_blob() + encode_data_blob(nodes)

    m = tmp_path / "mirror"
    m.mkdir()

    def publish_dump(date, with_update):
        name = f"history-{date}.osm.pbf"
        (m / name).write_bytes(dump_bytes(with_update))
        d = hashlib.md5((m / name).read_bytes()).hexdigest()
        (m / f"{name}.md5").write_text(f"{d}  {name}\n")
        (m / "index.html").write_text(f'<a href="{name}">{name}</a>')

    import osm_history_splitter_spark.fetch as fetch_mod
    from osm_history_splitter_spark.sources.pbf import load_pbf_dataframes

    real = fetch_mod._read_url
    monkeypatch.setattr(
        fetch_mod, "_read_url",
        lambda url: (m / "index.html").read_bytes()
        if url.endswith("?C=M;O=D") else real(url),
    )
    work = tmp_path / "work"
    work.mkdir()
    (work / "t.config").write_text("t.osh BBOX -1,-1,1,1\n")
    loader = lambda sp, path: load_pbf_dataframes(sp, path)  # noqa: E731

    publish_dump("2024-01-01", False)
    r1 = fetch_and_split(
        spark, f"file://{m}", str(work), loader, incremental=True,
        emit_osm=True,
    )
    assert "incremental" not in r1  # first tick = full split
    t = VersionedTable(spark, str(work / "published" / "t" / "nodes"))
    assert t.read().count() == 8
    osm1 = work / "extracts" / "2024-01-01" / "t" / "osm" / "t.osh"
    assert osm1.exists()

    publish_dump("2024-02-01", True)
    r2 = fetch_and_split(
        spark, f"file://{m}", str(work), loader, incremental=True,
        emit_osm=True, compact_after=1,
    )
    assert r2["incremental"]["t"]["nodes"] == 1  # only id 0 changed
    assert t.read().count() == 9
    assert t.read(version=1).count() == 8  # the January state, intact
    # compact_after=1: the CDC tick's merge-on-read state was folded into
    # a clean snapshot right away — head manifest carries no deletes
    assert r2["compacted"]["t"]["nodes"] == t.versions()[-1]
    assert "deletes" not in t._manifest(t.versions()[-1])
    # emit_osm on an incremental tick refreshes the extract file from the
    # published tables (it used to go silently stale in CDC mode)
    assert r2["emitted"] == {"t": ["t"]}
    osm2 = work / "extracts" / "2024-02-01" / "t" / "osm" / "t.osh"
    from osm_history_splitter_spark.sources.osm_xml import parse_osm_xml

    out_n, _, _ = parse_osm_xml(osm2)
    assert {(r[0], r[1]) for r in out_n} == {(i, 1) for i in range(8)} | {
        (0, 2)
    }
