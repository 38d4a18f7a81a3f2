"""TableGroup: snapshot-consistent multi-table publish sets — pins,
group time travel, the crash window between member commits, and the
splitter integration (publish, CDC, compaction, emission all pin/read
through the group)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from osm_history_splitter_spark.plans.table import (
    TableGroup,
    VersionedTable,
)


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(F.col("id"), F.lit(tag).alias("tag"))


def test_pin_members_and_group_time_travel(spark, tmp_path):
    g = TableGroup(spark, str(tmp_path))
    a, b = g.table("a"), g.table("b")
    va1, vb1 = a.commit(_df(spark, 0, 3, "x")), b.commit(_df(spark, 0, 5, "y"))
    g1 = g.pin({"a": va1, "b": vb1})
    va2 = a.commit(_df(spark, 3, 9, "x2"))
    g2 = g.pin({"a": va2, "b": vb1})
    assert g.versions() == [g1, g2] == [1, 2]
    assert g.members(g1) == {"a": 1, "b": 1}
    assert g.members() == {"a": 2, "b": 1}
    # group time travel pins ALL members at once
    assert g.read("a", group_version=g1).count() == 3
    assert g.read("a").count() == 9
    assert g.read("b", group_version=g1).count() == 5
    with pytest.raises(FileNotFoundError):
        g.members(99)


def test_crash_between_member_commits_is_invisible(spark, tmp_path):
    """A writer that committed table 'a' but died before committing 'b'
    (and before pinning) leaves group readers on the previous consistent
    set — the exact mixed-snapshot window the group exists to close."""
    g = TableGroup(spark, str(tmp_path))
    a, b = g.table("a"), g.table("b")
    g.pin({"a": a.commit(_df(spark, 0, 4, "v1")),
           "b": b.commit(_df(spark, 0, 4, "v1"))})
    # crash mid-publish: only 'a' advances, no pin
    a.commit(_df(spark, 0, 8, "v2"), mode="overwrite")
    assert {r["tag"] for r in g.read("a").collect()} == {"v1"}
    assert a.read().count() == 8  # raw table head DID move
    # the retry completes the set and pins: now v2 is the group truth
    g.pin({"a": a.versions()[-1],
           "b": b.commit(_df(spark, 0, 8, "v2"), mode="overwrite")})
    assert {r["tag"] for r in g.read("a").collect()} == {"v2"}
    assert g.read("b").count() == 8


def test_splitter_publish_and_cdc_pin_groups(spark, tmp_path):
    """run_split --publish-table pins group 1; incremental_resplit pins
    group 2 carrying each entity's (possibly unchanged) version; the
    emission helper resolves through the pin."""
    from osm_history_splitter_spark.model import (
        NODE_SCHEMA,
        RELATION_SCHEMA,
        WAY_SCHEMA,
    )
    from osm_history_splitter_spark.plans.catalog import (
        Extract,
        ExtractCatalog,
    )
    from osm_history_splitter_spark.splitter import (
        emit_osm_from_published,
        incremental_resplit,
        run_split,
    )

    ts = dt.datetime(2020, 1, 1)

    def _nodes(rows):
        return spark.createDataFrame(
            [(i, v, True, ts, 0, 0, "u", p, p, {}) for i, v, p in rows],
            NODE_SCHEMA,
        )

    empty_w = spark.createDataFrame([], WAY_SCHEMA)
    empty_r = spark.createDataFrame([], RELATION_SCHEMA)
    cat = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])
    base = [(i, 1, 0.5) for i in range(6)]
    m = run_split(
        spark, _nodes(base), empty_w, empty_r, cat,
        str(tmp_path / "o1"), mode="softcut",
        checkpoint_dir=str(tmp_path / "ck1"),
        publish_table=str(tmp_path / "pub"),
    )
    assert m["published"]["group"] == 1
    g = TableGroup(spark, str(tmp_path / "pub"))
    assert g.members() == {
        e: m["published"][e] for e in ("nodes", "ways", "relations")
    }

    rep = incremental_resplit(
        spark, _nodes(base + [(2, 2, 0.5)]), empty_w, empty_r, cat,
        str(tmp_path / "pub"), str(tmp_path / "ck1"), str(tmp_path / "ck2"),
    )
    assert rep["group"] == 2
    # unchanged entities pin their UNCHANGED versions next to the new one
    assert g.members() == {
        e: rep[e]["version"] for e in ("nodes", "ways", "relations")
    }
    assert g.members()["nodes"] > g.members(1)["nodes"]
    assert g.members()["ways"] == g.members(1)["ways"]

    # emission resolves through the pin: group 1 = 6 nodes, head = 7
    out1 = emit_osm_from_published(
        spark, str(tmp_path / "pub"), cat, str(tmp_path / "e1"),
        filenames={"t": "t1.osm"}, group_version=1,
    )
    out2 = emit_osm_from_published(
        spark, str(tmp_path / "pub"), cat, str(tmp_path / "e2"),
        filenames={"t": "t2.osm"},
    )
    from osm_history_splitter_spark.sources.osm_xml import (
        load_osm_dataframes,
    )
    n1 = load_osm_dataframes(
        spark, str(tmp_path / "e1" / "t1.osm")
    )[0].count()
    n2 = load_osm_dataframes(
        spark, str(tmp_path / "e2" / "t2.osm")
    )[0].count()
    assert (n1, n2) == (6, 7), (out1, out2)


def test_pin_claim_crash_recovery(spark, tmp_path):
    """A claim left by a pin that died before the flip wedges the next
    pin (ConcurrentCommitError) until recover(); a FAILED attempt (bad
    members) releases its own claim."""
    from osm_history_splitter_spark.plans.table import ConcurrentCommitError

    g = TableGroup(spark, str(tmp_path))
    a = g.table("a")
    v = a.commit(_df(spark, 0, 2, "x"))
    g.pin({"a": v})
    # failed ATTEMPT: int(None) raises inside pin -> claim auto-released
    with pytest.raises(TypeError):
        g.pin({"a": None})
    assert g.pin({"a": v}) == 2
    # hard crash: claim exists, no manifest
    (tmp_path / "_group" / "g3.json.claim").touch()
    with pytest.raises(ConcurrentCommitError):
        g.pin({"a": v})
    assert g.recover(3) is True
    assert g.pin({"a": v}) == 3
    assert g.recover(3) is False  # committed pins are not recoverable


def test_compact_published_skips_unpinned_heads(spark, tmp_path):
    """compact_published must not fold an UNPINNED head (a crashed
    publisher's half-set) into the group — pinned-at-head tables compact
    and re-pin, the drifted one is left for the publisher's retry."""
    from osm_history_splitter_spark.splitter import compact_published

    g = TableGroup(spark, str(tmp_path))
    vers = {}
    for e in ("nodes", "ways", "relations"):
        t = g.table(e)
        t.commit(_df(spark, 0, 6, "v1"))
        vers[e] = t.commit(
            _df(spark, 0, 2, "v2"), mode="merge", merge_key="id",
            strategy="mor",
        )
    g.pin(vers)
    # crashed publisher: nodes advances past the pin, no new pin
    g.table("nodes").commit(
        _df(spark, 2, 4, "v3"), mode="merge", merge_key="id", strategy="mor"
    )
    out = compact_published(spark, str(tmp_path), threshold=1)
    assert "nodes" not in out  # head != pinned -> left alone
    assert set(out) == {"ways", "relations", "group"}
    m = g.members()
    assert m["nodes"] == vers["nodes"]  # group still on the pinned state
    assert m["ways"] == out["ways"] and m["relations"] == out["relations"]
    # group truth unchanged by compaction
    assert g.read("ways").count() == 6
