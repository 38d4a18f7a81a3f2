"""WARC/WET container codec + distributed sink/source
(sources/warc.py): pure-python record roundtrips, member framing,
index-split reads, byte determinism, pages-table roundtrip."""

from __future__ import annotations

import datetime as dt
import gzip
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from osm_history_splitter_spark.sources import warc as W
from osm_history_splitter_spark.sources.pages import synth_pages

TS = dt.datetime(2024, 3, 1, 12, 30, 0)


def test_record_roundtrip_pure():
    rec = W.encode_response_record("https://x.test/a?b=1", TS, b"<html>\xff</html>")
    [(headers, payload)] = list(W.parse_records(rec))
    assert headers["warc-type"] == "response"
    assert headers["warc-target-uri"] == "https://x.test/a?b=1"
    assert headers["warc-date"] == "2024-03-01T12:30:00Z"
    assert W._parse_http(payload) == b"<html>\xff</html>"


def test_conversion_record_lang_and_text():
    rec = W.encode_conversion_record("u", TS, "héllo wörld", "de")
    [(h, p)] = list(W.parse_records(rec))
    assert h["warc-type"] == "conversion"
    assert h["warc-identified-content-language"] == "de"
    assert p.decode("utf-8") == "héllo wörld"


def test_members_and_mixed_alignment():
    # three records, two members (record 2+3 share one member):
    # parse_records walks Content-Length, not member boundaries
    r1 = W.encode_response_record("u1", TS, b"a")
    r2 = W.encode_response_record("u2", TS, b"bb")
    r3 = W.encode_warcinfo_record("f.warc.gz")
    data = W.gzip_member(r1) + W.gzip_member(r2 + r3)
    plain = b"".join(W.iter_members(data))
    got = list(W.parse_records(plain))
    assert [h["warc-type"] for h, _ in got] == [
        "response", "response", "warcinfo",
    ]
    assert W._parse_http(got[1][1]) == b"bb"


def test_gzip_member_deterministic_and_standard():
    m1, m2 = W.gzip_member(b"payload"), W.gzip_member(b"payload")
    assert m1 == m2
    assert gzip.decompress(m1) == b"payload"


@pytest.fixture(scope="module")
def pages(spark, testdata_sf):
    return synth_pages(spark, testdata_sf).cache()


def _canon(df):
    return sorted(
        (r["url"], r["warc_ts"], bytes(r["html"]))
        for r in df.collect()
    )


def test_sink_source_roundtrip(spark, pages, tmp_path):
    out = tmp_path / "crawl"
    res = W.write_warc(pages, str(out), partitions=3)
    n = pages.count()
    assert res["records"] == n
    warc_files = sorted(out.glob("*.warc.gz"))
    assert 1 <= len(warc_files) <= 3
    assert len(sorted(out.glob("*.warc.gz.idx"))) == len(warc_files)

    got = W.read_warc(spark, str(out))
    want = pages.select("url", "warc_ts", "html")
    assert _canon(got) == _canon(want)

    wet = W.read_wet(spark, str(out))
    assert sorted(
        (r["url"], r["warc_ts"], r["text"], r["lang"]) for r in wet.collect()
    ) == sorted(
        (r["url"], r["warc_ts"], r["text"], r["lang"])
        for r in pages.select("url", "warc_ts", "text", "lang").collect()
    )


def test_index_range_split_equals_whole_file(
    spark, pages, tmp_path, monkeypatch
):
    out = tmp_path / "crawl"
    W.write_warc(pages.limit(200), str(out), partitions=2, wet=False)
    whole = _canon(W.read_warc(spark, str(out)))
    # force many byte-range tasks through the sidecar index
    monkeypatch.setattr(W, "RECORDS_PER_TASK", 7)
    split_tasks = W._read_tasks(str(out), "*.warc.gz")
    assert len(split_tasks) > 2  # genuinely intra-file split
    assert _canon(W.read_warc(spark, str(out))) == whole
    # index removal falls back to whole-file tasks, same rows
    for idx in out.glob("*.warc.gz.idx"):
        idx.unlink()
    assert W._read_tasks(str(out), "*.warc.gz") != split_tasks
    assert _canon(W.read_warc(spark, str(out))) == whole


def test_write_deterministic_bytes(spark, pages, tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    W.write_warc(pages.limit(60), str(a), partitions=2)
    W.write_warc(pages.limit(60), str(b), partitions=2)
    fa = sorted(p.name for p in a.iterdir())
    assert fa == sorted(p.name for p in b.iterdir())
    for name in fa:
        assert (a / name).read_bytes() == (b / name).read_bytes(), name


def test_url_snapshots_colocated_in_version_order(spark, pages, tmp_path):
    """O1/O2 for crawls: all snapshots of a url in ONE file, ts-ascending."""
    out = tmp_path / "crawl"
    W.write_warc(pages, str(out), partitions=3, wet=False)
    seen: dict[str, tuple[str, object]] = {}
    for f in sorted(out.glob("*.warc.gz")):
        plain = b"".join(W.iter_members(Path(f).read_bytes()))
        for h, _ in W.parse_records(plain):
            if h["warc-type"] != "response":
                continue
            url, ts = h["warc-target-uri"], h["warc-date"]
            if url in seen:
                pf, pts = seen[url]
                assert pf == str(f), f"url {url} split across files"
                assert pts <= ts, f"url {url} out of version order"
            seen[url] = (str(f), ts)


def test_read_pages_full_roundtrip(spark, pages, tmp_path):
    out = tmp_path / "crawl"
    W.write_warc(pages.limit(120), str(out), partitions=2)
    got = W.read_pages(spark, str(out))
    key = lambda r: (r["url"], r["warc_ts"])  # noqa: E731
    grows = sorted(
        (r["url"], r["warc_ts"], bytes(r["html"]), r["text"], r["lang"])
        for r in got.collect()
    )
    wrows = sorted(
        (r["url"], r["warc_ts"], bytes(r["html"]), r["text"], r["lang"])
        for r in pages.limit(120).collect()
    )
    assert grows == wrows


def test_split_pages_to_warc_membership_and_byte_identity(
    spark, pages, testdata_sf, tmp_path
):
    """Per-extract WARC dirs == the oracle-certified pages_split
    membership, and every emitted text/html byte-identical per url
    (the input_hint invariant driven through the container sink)."""
    from osm_history_splitter_spark.oracle_queries import catalog, q_pages_split

    out = tmp_path / "split"
    res = W.split_pages_to_warc(spark, pages, catalog(), str(out))
    want = q_pages_split(spark, testdata_sf)
    want_members = {
        (r["url"], r["extract"]) for r in want.collect()
    }
    assert res["groups"].keys() == {e for _, e in want_members}
    got_members = set()
    src = {
        (r["url"], r["warc_ts"]): (bytes(r["html"]), r["text"])
        for r in pages.collect()
    }
    for ext in res["groups"]:
        df = W.read_pages(spark, str(out / ext))
        for r in df.collect():
            got_members.add((r["url"], ext))
            assert (bytes(r["html"]), r["text"]) == src[
                (r["url"], r["warc_ts"])
            ]
    assert got_members == want_members
    # softcut completeness: every member url appears with ALL snapshots
    n_per_url = {
        r["url"]: r["n"]
        for r in pages.groupBy("url").agg(F.count("*").alias("n")).collect()
    }
    for ext, n_rec in res["groups"].items():
        urls = {u for u, e in got_members if e == ext}
        assert n_rec == sum(n_per_url[u] for u in urls)


# ------------------------------------------------- round-5 regressions

def test_conversion_record_null_text_and_lang():
    # null text ⇒ empty payload; null lang ⇒ header absent (never "None")
    rec = W.encode_conversion_record("u", TS, None, None)
    [(h, p)] = list(W.parse_records(rec))
    assert p == b""
    assert "warc-identified-content-language" not in h


def test_ts_iso_subsecond_lossless():
    import pandas as pd

    t = dt.datetime(2024, 3, 1, 12, 30, 0, 500000)
    assert W._ts_iso(t) == "2024-03-01T12:30:00.500000Z"
    assert W._ts_parse(W._ts_iso(t)) == pd.Timestamp(t)
    # whole seconds keep the compact classic form (fixture stability)
    assert W._ts_iso(TS) == "2024-03-01T12:30:00Z"


def test_iter_members_many_and_truncated():
    members = [
        W.gzip_member(bytes([i % 251]) * ((i * 997) % 5000 + 1))
        for i in range(50)
    ]
    data = b"".join(members)
    outs = list(W.iter_members(data))
    assert len(outs) == 50
    assert outs[7] == bytes([7]) * ((7 * 997) % 5000 + 1)
    # a truncated final member (a file caught mid-write) raises loudly
    # instead of silently yielding a partial record
    with pytest.raises(ValueError, match="truncated"):
        list(W.iter_members(data[:-10]))


def test_read_pages_warc_only_dir_raises(spark, pages, tmp_path):
    W.write_warc(pages.limit(20), str(tmp_path), partitions=1, wet=False)
    with pytest.raises(ValueError, match="wet"):
        W.read_pages(spark, str(tmp_path))


def test_null_text_and_lang_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("u1", TS, bytearray(b"<h>"), None, None),
            ("u2", TS, None, "txt", "en"),
        ],
        "url string, warc_ts timestamp, html binary,"
        " text string, lang string",
    )
    W.write_warc(df, str(tmp_path), partitions=1)
    got = {
        r["url"]: (bytes(r["html"]), r["text"], r["lang"])
        for r in W.read_pages(spark, str(tmp_path)).collect()
    }
    assert got == {"u1": (b"<h>", "", ""), "u2": (b"", "txt", "en")}


def test_subsecond_snapshots_roundtrip_without_fanout(spark, tmp_path):
    # two snapshots of one url inside the same second: the roundtrip
    # keeps both timestamps distinct, so the read_pages (url, warc_ts)
    # join yields 2 rows — not a 2x2 key collision
    t1 = dt.datetime(2024, 3, 1, 12, 30, 0, 500000)
    t2 = dt.datetime(2024, 3, 1, 12, 30, 0, 900000)
    df = spark.createDataFrame(
        [("u", t1, bytearray(b"a"), "A", "en"),
         ("u", t2, bytearray(b"b"), "B", "en")],
        "url string, warc_ts timestamp, html binary,"
        " text string, lang string",
    )
    W.write_warc(df, str(tmp_path), partitions=1)
    rows = W.read_pages(spark, str(tmp_path)).collect()
    assert len(rows) == 2
    assert {r["warc_ts"] for r in rows} == {t1, t2}
    assert {(r["text"], bytes(r["html"])) for r in rows} == {
        ("A", b"a"), ("B", b"b"),
    }


def test_sink_publish_is_atomic_rename(spark, pages, tmp_path):
    # final names appear only via os.replace: afterwards no *.tmp
    # remains and every data file already has its idx sidecar — the
    # invariant the crawl-feed streaming source's listing relies on
    W.write_warc(pages.limit(50), str(tmp_path), partitions=2)
    tmps = list(Path(tmp_path).rglob("*.tmp"))
    assert tmps == []
    data = sorted(Path(tmp_path).rglob("*.warc.gz")) + sorted(
        Path(tmp_path).rglob("*.wet.gz")
    )
    assert data, "sink wrote nothing"
    for f in data:
        assert Path(str(f) + ".idx").exists()


def test_gzip_member_matches_stdlib():
    """The hand-framed member must stay byte-identical to
    gzip.GzipFile(mtime=0) — readers and fixtures depend on the bytes."""
    import gzip
    import io
    import random

    rng = random.Random(7)
    for n in (0, 1, 13, 4096, 100_000):
        data = bytes(rng.randrange(256) for _ in range(n))
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
            g.write(data)
        assert W.gzip_member(data) == buf.getvalue()
