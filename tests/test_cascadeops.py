"""Batch 123: cascade + matching — python mirrors (threshold cascade
round-by-round; sequential greedy matching) and the structural
invariants (cascade monotone; matching is a valid maximal matching)."""

import glob
import hashlib

import pandas as pd

SF = "/root/testdata/sf0.001"


def _ids():
    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    return pd.concat(
        pd.read_parquet(f, columns=["doc_id"]) for f in files
    )["doc_id"].astype(int).tolist()


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _dir_edges(ids):
    n = len(ids)
    e = set()
    for i in ids:
        if i % 3 != 0 and (2 * i + 1) % n != i:
            e.add((i, (2 * i + 1) % n))
        if i % 2 == 0 and (7 * i + 3) % n != i:
            e.add((i, (7 * i + 3) % n))
        if i % 6 == 1 and (i + n // 2) % n != i:
            e.add((i, (i + n // 2) % n))
    return e


def test_cascade_spread_matches_python(spark):
    from ocr_to_csv_spark.functions.cascadeops import (
        CASCADE_R,
        SEED_MOD,
        q_cascade_spread,
    )

    ids = _ids()
    edges = _dir_edges(ids)
    theta = {v: _h32(f"th|{v}") % 2 + 1 for v in ids}
    active = {v for v in ids if v % SEED_MOD == 0}
    gold = [(0, len(active), len(active))]
    for r in range(1, CASCADE_R + 1):
        n_in = {}
        for s, d in edges:
            if s in active:
                n_in[d] = n_in.get(d, 0) + 1
        new = {
            v for v, c in n_in.items() if c >= theta[v] and v not in active
        }
        active |= new
        gold.append((r, len(active), len(new)))
    got = [
        (r.round, r.n_active, r.n_new)
        for r in q_cascade_spread(spark, SF).collect()
    ]
    assert got == gold
    # monotone growth
    assert all(b[1] >= a[1] for a, b in zip(got, got[1:]))


def test_greedy_matching_matches_python(spark):
    from ocr_to_csv_spark.functions.cascadeops import (
        _py_greedy_matching,
        q_greedy_matching,
    )

    gold = _py_greedy_matching(SF)
    got = [(r.lo, r.hi) for r in q_greedy_matching(spark, SF).collect()]
    assert got == gold
    # validity: no node matched twice
    ends = [v for e in got for v in e]
    assert len(ends) == len(set(ends))
    # maximality: every unmatched undirected edge touches a matched node
    ids = _ids()
    ue = {(min(a, b), max(a, b)) for a, b in _dir_edges(ids)}
    matched_nodes = set(ends)
    for e in ue - set(got):
        assert e[0] in matched_nodes or e[1] in matched_nodes
