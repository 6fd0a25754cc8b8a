"""Batch 116: HyperANF — full python mirror (register init, H=2
max-merge propagation, estimate formula) plus the sketch-vs-exact
sanity that linear counting is exact-ish for tiny balls."""

import glob
import hashlib
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _n_docs():
    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    return sum(len(pd.read_parquet(f, columns=["doc_id"])) for f in files)


def _adj(n):
    ue = set()
    for d in range(n):
        dsts = []
        if d % 3 != 0:
            dsts.append((2 * d + 1) % n)
        if d % 2 == 0:
            dsts.append((7 * d + 3) % n)
        if d % 6 == 1:
            dsts.append((d + n // 2) % n)
        for dst in dsts:
            if dst != d:
                ue.add((min(d, dst), max(d, dst)))
    adj = {}
    for lo, hi in ue:
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)
    return adj


def test_anf_reach_matches_python(spark):
    from ocr_to_csv_spark.functions.anfops import (
        ANF_ALPHA,
        ANF_H,
        ANF_M,
        ANF_POW,
        ANF_RHO0,
        q_anf_reach,
    )

    n = _n_docs()
    adj = _adj(n)

    def regs(v):
        h = int(hashlib.md5(f"anf|{v}".encode()).hexdigest()[:8], 16)
        b, w = h % ANF_M, h // ANF_M
        rho = ANF_RHO0 if w == 0 else ANF_RHO0 - w.bit_length()
        return {b: rho}

    state = {v: regs(v) for v in adj}
    for _ in range(ANF_H):
        nxt = {}
        for v in adj:
            merged = dict(state[v])
            for u in adj[v]:
                for b, r in state[u].items():
                    if merged.get(b, -1) < r:
                        merged[b] = r
            nxt[v] = merged
        state = nxt

    def est_milli(rs):
        s = sum(1 << (ANF_RHO0 - r) for r in rs.values())
        npresent = len(rs)
        t = s + (ANF_M - npresent) * ANF_POW
        raw = ANF_ALPHA * ANF_M * ANF_M * ANF_POW / t
        v = ANF_M - npresent
        e = ANF_M * math.log(ANF_M / v) if (raw <= 2.5 * ANF_M and v > 0) else raw
        return int(round(e * 1000))

    def ball2p1(v):
        b = set(adj[v])
        for u in adj[v]:
            b |= adj[u]
        b.discard(v)
        return len(b) + 1

    gold = {}
    for v in adj:
        k = ball2p1(v)
        cnt, tot = gold.get(k, (0, 0))
        gold[k] = (cnt + 1, tot + est_milli(state[v]))
    got = {
        r.ball2p1: (r.n_nodes, r.sum_est_milli, r.exact_total)
        for r in q_anf_reach(spark, SF).collect()
    }
    assert got == {k: (c, t, k * c) for k, (c, t) in gold.items()}
    # linear counting keeps small-ball relative error modest: the mean
    # estimate for every exact size stays within ±40% of the truth
    for k, (c, t, _) in got.items():
        assert abs(t / c / 1000 - k) / k < 0.4
