"""Indexed CDC path (operators/incremental.py): per-id signature diffs +
reverse-reference indexes must reproduce EXACTLY the markers and published
state a from-scratch split computes — including the hairy propagation
cases (dangling refs resolving, relation affectedness closing upward,
unaffected-child membership injection)."""

from __future__ import annotations

import datetime as dt
import json
from pathlib import Path

from osm_history_splitter_spark.model import (
    NODE_SCHEMA,
    RELATION_SCHEMA,
    WAY_SCHEMA,
)
from osm_history_splitter_spark.plans.catalog import Extract, ExtractCatalog
from osm_history_splitter_spark.plans.checkpoint import StageStore
from osm_history_splitter_spark.plans.table import VersionedTable
from osm_history_splitter_spark.splitter import (
    MARKER_STAGES,
    incremental_resplit,
    run_split,
)

TS = dt.datetime(2020, 1, 1)
IN, OUT = 0.5, 5.0
CAT = ExtractCatalog([Extract.bbox("t", -1.0, -1.0, 1.0, 1.0)])


def _nodes(spark, rows):
    return spark.createDataFrame(
        [(i, v, True, TS, 0, 0, "u", pos, pos, {}) for i, v, pos in rows],
        schema=NODE_SCHEMA,
    )


def _ways(spark, rows):
    return spark.createDataFrame(
        [(i, v, True, TS, 0, 0, "u", refs, {}) for i, v, refs in rows],
        schema=WAY_SCHEMA,
    )


def _rels(spark, rows):
    return spark.createDataFrame(
        [
            (
                i, v, True, TS, 0, 0, "u",
                [{"type": t, "ref": r, "role": ""} for t, r in members], {},
            )
            for i, v, members in rows
        ],
        schema=RELATION_SCHEMA,
    )


def _table_contents(spark, pub, entity):
    df = VersionedTable(spark, f"{pub}/{entity}").read()
    return sorted(
        (r["id"], r["version"], r["extract"]) for r in
        df.select("id", "version", "extract").collect()
    )


def _marker_contents(spark, ck, stage):
    store = StageStore(spark, ck, bucket_by=("id", 8))
    return sorted(tuple(r) for r in store.load_plain(stage).collect())


def _seed(spark, tmp_path, n1, w1, r1):
    pub, ck1 = str(tmp_path / "pub"), str(tmp_path / "ck1")
    run_split(
        spark, n1, w1, r1, CAT, str(tmp_path / "o1"),
        checkpoint_dir=ck1, publish_table=pub, write_indexes=True,
    )
    return pub, ck1


def _assert_equals_fresh(spark, tmp_path, pub, ck2, n2, w2, r2, tag=""):
    """Published state AND every marker stage equal a from-scratch split."""
    base = tmp_path / f"fresh{tag}"
    ckf = str(base / "ck")
    run_split(
        spark, n2, w2, r2, CAT, str(base / "o"),
        checkpoint_dir=ckf, publish_table=str(base / "pub"),
        write_indexes=True,
    )
    for entity in ("nodes", "ways", "relations"):
        assert _table_contents(spark, pub, entity) == _table_contents(
            spark, str(base / "pub"), entity
        ), (tag, entity)
    for stage in MARKER_STAGES + ("extra_counts",):
        assert _marker_contents(spark, ck2, stage) == _marker_contents(
            spark, ckf, stage
        ), (tag, stage)


def test_indexed_tick_equals_full_split(spark, tmp_path):
    """Mixed churn across all three entities takes the indexed path on
    the FIRST tick (seeded with write_indexes=True) and lands exactly the
    from-scratch state — markers included."""
    n1 = _nodes(
        spark,
        [(i, 1, IN) for i in range(10)] + [(i, 1, OUT) for i in range(30, 34)],
    )
    w1 = _ways(spark, [(100, 1, [0, 1]), (101, 1, [30, 31])])
    r1 = _rels(spark, [(200, 1, [("n", 0), ("w", 101)])])
    pub, ck1 = _seed(spark, tmp_path, n1, w1, r1)

    # churn (immutability-honoring: an edit is a NEW version, a leave is
    # a REDACTION — splitter._world_sigs): node 3's inside v1 is redacted
    # and v2 lands outside (leaves), node 30 gains v2 inside (enters —
    # flipping way 101 with it), node 5 gains a data-only version, way
    # 100 gains a version referencing OUT node 33 (extra node), rel 200
    # gains a version adding a member
    n2 = _nodes(
        spark,
        [(i, 1, IN) for i in range(10) if i != 3]
        + [(3, 2, OUT), (5, 2, IN), (30, 2, IN)]
        + [(i, 1, OUT) for i in range(30, 34)],
    )
    w2 = _ways(
        spark, [(100, 1, [0, 1]), (100, 2, [0, 33]), (101, 1, [30, 31])]
    )
    r2 = _rels(
        spark,
        [(200, 1, [("n", 0), ("w", 101)]), (200, 2, [("n", 1)])],
    )
    rep = incremental_resplit(
        spark, n2, w2, r2, CAT, pub, ck1, str(tmp_path / "ck2")
    )
    assert rep["marker_strategy"] == "indexed"
    # tight delta: nodes {3 out, 5 data, 30 flip-in, 33 extra-in, 31
    # extra via way 101's flip}, ways {100 edited, 101 flipped}, rel {200}
    assert rep["nodes"]["affected_ids"] <= 5
    assert rep["ways"]["affected_ids"] <= 2
    assert rep["relations"]["affected_ids"] == 1
    _assert_equals_fresh(
        spark, tmp_path, pub, str(tmp_path / "ck2"), n2, w2, r2
    )


def test_dangling_ref_resolution_triggers_way(spark, tmp_path):
    """A way referencing a NOT-YET-EXISTING node must flip to member when
    a later tick creates that node inside the bbox — the reverse index is
    built from ref lists, not resolved rows, so the unchanged way is
    still found."""
    n1 = _nodes(spark, [(0, 1, OUT)])
    w1 = _ways(spark, [(100, 1, [0, 50])])  # node 50 does not exist yet
    r1 = _rels(spark, [])
    pub, ck1 = _seed(spark, tmp_path, n1, w1, r1)
    assert _table_contents(spark, pub, "ways") == []

    n2 = _nodes(spark, [(0, 1, OUT), (50, 1, IN)])
    rep = incremental_resplit(
        spark, n2, w1, r1, CAT, pub, ck1, str(tmp_path / "ck2")
    )
    assert rep["marker_strategy"] == "indexed"
    assert rep["ways"]["affected_ids"] == 1
    # way 100 in; node 0 pulled in as extra node despite being OUT
    assert _table_contents(spark, pub, "ways") == [(100, 1, "t")]
    got_nodes = _table_contents(spark, pub, "nodes")
    assert (0, 1, "t") in got_nodes and (50, 1, "t") in got_nodes
    _assert_equals_fresh(
        spark, tmp_path, pub, str(tmp_path / "ck2"), n2, w1, r1
    )


def test_relation_affectedness_closes_upward(spark, tmp_path):
    """node flip → rel 200 (direct member) → rel 300 (parent of 200) →
    rel 400 (grandparent): the upward closure must pull the whole chain
    into the recompute set even though only one node moved."""
    n1 = _nodes(spark, [(0, 1, OUT), (1, 1, IN)])
    w1 = _ways(spark, [])
    r1 = _rels(
        spark,
        [
            (200, 1, [("n", 0)]),
            (300, 1, [("r", 200)]),
            (400, 1, [("r", 300)]),
        ],
    )
    pub, ck1 = _seed(spark, tmp_path, n1, w1, r1)
    assert _table_contents(spark, pub, "relations") == []

    n2 = _nodes(spark, [(0, 2, IN), (0, 1, OUT), (1, 1, IN)])
    rep = incremental_resplit(
        spark, n2, w1, r1, CAT, pub, ck1, str(tmp_path / "ck2")
    )
    assert rep["marker_strategy"] == "indexed"
    assert rep["relations"]["affected_ids"] == 3
    assert _table_contents(spark, pub, "relations") == [
        (200, 1, "t"), (300, 1, "t"), (400, 1, "t"),
    ]
    _assert_equals_fresh(
        spark, tmp_path, pub, str(tmp_path / "ck2"), n2, w1, r1
    )


def test_unaffected_child_membership_injected(spark, tmp_path):
    """An edited parent whose membership flows ONLY from an UNtracked
    edit — its child relation is unaffected — must keep that child's old
    membership through the inject path (the child is never recomputed)."""
    n1 = _nodes(spark, [(0, 1, IN), (1, 1, OUT)])
    w1 = _ways(spark, [])
    r1 = _rels(
        spark,
        [
            (600, 1, [("n", 0)]),        # tracked via node 0
            (500, 1, [("r", 600)]),      # tracked via child 600
        ],
    )
    pub, ck1 = _seed(spark, tmp_path, n1, w1, r1)
    assert _table_contents(spark, pub, "relations") == [
        (500, 1, "t"), (600, 1, "t"),
    ]
    # rel 500 gains a version adding an OUT member; child 600 untouched
    r2 = _rels(
        spark,
        [
            (600, 1, [("n", 0)]),
            (500, 1, [("r", 600)]),
            (500, 2, [("r", 600), ("n", 1)]),
        ],
    )
    rep = incremental_resplit(
        spark, n1, w1, r2, CAT, pub, ck1, str(tmp_path / "ck2")
    )
    assert rep["marker_strategy"] == "indexed"
    # only rel 500 recomputed; 600's membership injected, not recomputed
    assert rep["relations"]["affected_ids"] == 1
    assert _table_contents(spark, pub, "relations") == [
        (500, 1, "t"), (500, 2, "t"), (600, 1, "t"),
    ]
    _assert_equals_fresh(
        spark, tmp_path, pub, str(tmp_path / "ck2"), n1, w1, r2
    )


def test_indexed_adopts_untouched_entity_stages(spark, tmp_path):
    """Data-only node churn (no membership flip): way and relation marker
    stages must be ADOPTED byte-for-byte (driver file copy, no recompute)
    while the nodes entity still lands its delta."""
    n1 = _nodes(spark, [(i, 1, IN) for i in range(8)])
    w1 = _ways(spark, [(100, 1, [0, 1])])
    r1 = _rels(spark, [(200, 1, [("w", 100)])])
    pub, ck1 = _seed(spark, tmp_path, n1, w1, r1)

    n2 = _nodes(
        spark, [(i, 1, IN) for i in range(8)] + [(5, 2, IN), (7, 2, IN)]
    )
    rep = incremental_resplit(
        spark, n2, w1, r1, CAT, pub, ck1, str(tmp_path / "ck2")
    )
    assert rep["marker_strategy"] == "indexed"
    assert rep["nodes"]["affected_ids"] == 2
    assert rep["ways"]["affected_ids"] == 0
    assert rep["relations"]["affected_ids"] == 0
    for stage in ("way_members", "relation_members", "extra_counts",
                  "way_refs", "rel_member_idx"):
        m1 = json.loads((Path(ck1) / f"{stage}._DONE").read_text())
        m2 = json.loads(
            (Path(tmp_path / "ck2") / f"{stage}._DONE").read_text()
        )
        assert m1 == m2, stage  # byte-equal marker => copied, not recomputed
    _assert_equals_fresh(
        spark, tmp_path, pub, str(tmp_path / "ck2"), n2, w1, r1
    )


def test_indexed_randomized_differential(spark, tmp_path):
    """Random worlds with nested relations + random churn on every
    entity: the indexed tick must equal a from-scratch split — published
    rows AND all marker stages — seed by seed."""
    import random

    for seed in (11, 42):
        rng = random.Random(seed)
        base = tmp_path / f"s{seed}"
        base.mkdir()

        def pos():
            return rng.choice([IN, OUT]) + rng.random() * 0.3

        n_rows = [(i, 1, pos()) for i in range(24)]
        w_rows = [(100 + j, 1, rng.sample(range(26), 3)) for j in range(5)]
        r_rows = [
            (200, 1, [("n", rng.randrange(24)), ("w", 100)]),
            (201, 1, [("r", 200), ("w", rng.choice([101, 102]))]),
            (202, 1, [("r", 201)]),
        ]
        n1, w1, r1 = (
            _nodes(spark, n_rows), _ways(spark, w_rows), _rels(spark, r_rows)
        )
        pub, ck1 = _seed(spark, base, n1, w1, r1)

        # churn: 4 nodes move, 1 new node, 1 way re-refs, 1 new way,
        # rel 201 gains a version with a shuffled member list
        n_rows2 = list(n_rows) + [(i, 2, pos()) for i in rng.sample(range(24), 4)]
        n_rows2.append((40, 1, pos()))
        w_rows2 = w_rows + [
            (rng.choice([101, 103]), 2, rng.sample(range(41), 3)),
            (110, 1, rng.sample(range(41), 2)),
        ]
        r_rows2 = r_rows + [
            (201, 2, [("r", 200), ("n", rng.randrange(41))]),
        ]
        n2, w2, r2 = (
            _nodes(spark, n_rows2), _ways(spark, w_rows2), _rels(spark, r_rows2)
        )
        rep = incremental_resplit(
            spark, n2, w2, r2, CAT, pub, ck1, str(base / "ck2")
        )
        assert rep["marker_strategy"] == "indexed", seed
        _assert_equals_fresh(
            spark, base, pub, str(base / "ck2"), n2, w2, r2, tag=str(seed)
        )


def test_second_tick_goes_indexed_after_full_bootstrap(spark, tmp_path):
    """Un-indexed seed: tick 1 falls back to the full marker path and
    bootstraps the indexes; tick 2 runs indexed. Both land the
    from-scratch state."""
    n1 = _nodes(spark, [(i, 1, IN) for i in range(6)])
    w1 = _ways(spark, [(100, 1, [0, 1])])
    r1 = _rels(spark, [])
    pub, ck1 = str(tmp_path / "pub"), str(tmp_path / "ck1")
    run_split(
        spark, n1, w1, r1, CAT, str(tmp_path / "o1"),
        checkpoint_dir=ck1, publish_table=pub,  # no write_indexes
    )
    n2 = _nodes(spark, [(i, 1, IN) for i in range(6)] + [(10, 1, IN)])
    rep1 = incremental_resplit(
        spark, n2, w1, r1, CAT, pub, ck1, str(tmp_path / "ck2")
    )
    assert rep1["marker_strategy"] == "full"
    n3 = _nodes(
        spark, [(i, 1, IN) for i in range(6)] + [(10, 1, IN), (11, 1, OUT)]
    )
    rep2 = incremental_resplit(
        spark, n3, w1, r1, CAT, pub,
        str(tmp_path / "ck2"), str(tmp_path / "ck3"),
    )
    assert rep2["marker_strategy"] == "indexed"
    _assert_equals_fresh(
        spark, tmp_path, pub, str(tmp_path / "ck3"), n3, w1, r1
    )
