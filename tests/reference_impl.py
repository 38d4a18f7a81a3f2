"""Tiny in-memory reference implementation of the softcut/hardcut
*semantics* (set-based, order-free — a clean-room formulation of the rules
documented in SURVEY.md §2/§3, NOT a port of the C++). Used as the oracle
for randomized Spark-equivalence tests.

World model: nodes = [(id, version, lon, lat)], ways = [(id, version,
refs)], relations = [(id, version, members)] with members = [(type, ref)].
Extracts: {name: predicate(lon, lat) -> bool}.
"""

from __future__ import annotations


def softcut_ref(nodes, ways, relations, extracts):
    out = {}
    for name, pred in extracts.items():
        node_ids = {n[0] for n in nodes if pred(n[2], n[3])}
        way_ids = {
            w[0] for w in ways if any(r in node_ids for r in w[2])
        }
        # reference-completeness: refs of ALL versions of tracked ways
        extra = {
            r for w in ways if w[0] in way_ids for r in w[2]
        }
        # direct relation hits on n/w members
        rel_ids = {
            rel[0]
            for rel in relations
            if any(
                (t == "n" and ref in node_ids) or (t == "w" and ref in way_ids)
                for t, ref in rel[2]
            )
        }
        # closure: parent tracked when any 'r' member is tracked (fixpoint)
        changed = True
        while changed:
            changed = False
            for rel in relations:
                if rel[0] in rel_ids:
                    continue
                if any(t == "r" and ref in rel_ids for t, ref in rel[2]):
                    rel_ids.add(rel[0])
                    changed = True
        out[name] = {
            "nodes": node_ids | extra,
            "ways": way_ids,
            "relations": rel_ids,
        }
    return out


def hardcut_ref(nodes, ways, relations, extracts):
    out = {}
    for name, pred in extracts.items():
        node_versions = {
            (n[0], n[1]) for n in nodes if pred(n[2], n[3])
        }
        node_ids = {i for i, _ in node_versions}
        out_ways = {}
        way_ids = set()
        for w in ways:
            kept = [r for r in w[2] if r in node_ids]
            if kept and len(kept) >= 2:
                out_ways[(w[0], w[1])] = kept
                way_ids.add(w[0])
        out_rels = {}
        for rel in relations:
            kept = [
                (t, ref)
                for t, ref in rel[2]
                if (t == "n" and ref in node_ids) or (t == "w" and ref in way_ids)
            ]
            if kept:
                out_rels[(rel[0], rel[1])] = kept
        out[name] = {
            "node_versions": node_versions,
            "ways": out_ways,
            "relations": out_rels,
        }
    return out
