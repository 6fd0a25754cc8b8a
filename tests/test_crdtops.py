"""Batch 165: CRDT audits — python mirrors of both merges and the
convergence guarantees (G-counter merge recovers the truth no matter
how stale the gossip; OR-set membership is add-wins under the causal
cover rule)."""

import glob
import hashlib

import pandas as pd

SF = "/root/testdata/sf0.001"


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _read(name, cols):
    files = sorted(glob.glob(f"{SF}/{name}.parquet")) or sorted(
        glob.glob(f"{SF}/{name}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def test_gcounter_matches_python_and_converges(spark):
    from ocr_to_csv_spark.functions.crdtops import (
        R_REPLICAS, q_crdt_gcounter,
    )

    ev = _read("events", ["event_id"])
    n = [0] * R_REPLICAS
    for eid in ev.event_id:
        n[_h32(f"gc|{int(eid)}") % R_REPLICAS] += 1
    exp = {}
    for s in range(R_REPLICAS):
        views = [
            n[s] if r == s else (n[s] * (_h32(f"gs|{r}|{s}") % 100)) // 100
            for r in range(R_REPLICAS)
        ]
        exp[s] = (n[s], max(views), min(views), int(max(views) == n[s]))
    got = {
        r.slot: (r.n_true, r.merged, r.min_observed, r.converged)
        for r in q_crdt_gcounter(spark, SF).collect()
    }
    assert got == exp
    # THE CRDT guarantee: every slot converges despite stale gossip
    assert all(v[3] == 1 for v in got.values())
    assert any(v[2] < v[0] for v in got.values())  # gossip really stale


def test_orset_matches_python(spark):
    from ocr_to_csv_spark.functions.crdtops import OR_ELEMS, q_crdt_orset

    li = _read("lineitem", ["l_partkey", "l_orderkey", "l_linenumber"])
    per = {}
    for r in li.itertuples(index=False):
        e = int(r.l_partkey) % OR_ELEMS
        tag = int(r.l_orderkey)
        add = _h32(f"or|{tag}|{int(r.l_linenumber)}") % 3 != 0
        st = per.setdefault(e, [0, 0, -1, -1])
        if add:
            st[0] += 1
            st[2] = max(st[2], tag)
        else:
            st[1] += 1
            st[3] = max(st[3], tag)
    exp = {
        e: (a, rm, ma, mr, int(ma > mr))
        for e, (a, rm, ma, mr) in per.items()
    }
    got = {
        r.elem: (r.n_adds, r.n_removes, r.max_add_tag, r.max_rm_tag,
                 r.member)
        for r in q_crdt_orset(spark, SF).collect()
    }
    assert got == exp
    # both outcomes occur: some elements survive, some are removed
    members = [v[4] for v in got.values()]
    assert 0 < sum(members) < len(members)
