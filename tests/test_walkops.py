"""Batch 127: wedge-sampling triangle estimate + hash walks — python
mirrors and the estimator sanities (wedge identities; walks only
follow real edges)."""

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


def _graph(ids):
    n = len(ids)
    dir_edges = set()
    for i in ids:
        if i % 3 != 0 and (2 * i + 1) % n != i:
            dir_edges.add((i, (2 * i + 1) % n))
        if i % 2 == 0 and (7 * i + 3) % n != i:
            dir_edges.add((i, (7 * i + 3) % n))
        if i % 6 == 1 and (i + n // 2) % n != i:
            dir_edges.add((i, (i + n // 2) % n))
    ue = {(min(a, b), max(a, b)) for a, b in dir_edges}
    return dir_edges, ue


def test_triangle_est_matches_python(spark):
    from ocr_to_csv_spark.functions.walkops import WS_P, q_triangle_est

    ids = _ids()
    _, ue = _graph(ids)
    adj = {}
    for lo, hi in ue:
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)
    w_tot = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    n_sampled = n_closed = 0
    for v, ns in adj.items():
        s = sorted(ns)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                a, b = s[i], s[j]
                if _h32(f"ws|{v}|{a}|{b}") % WS_P == 0:
                    n_sampled += 1
                    if (min(a, b), max(a, b)) in ue:
                        n_closed += 1
    exact = 0
    for lo, hi in ue:
        for c in adj[lo]:
            if c > hi and c in adj[hi]:
                exact += 1
    r = q_triangle_est(spark, SF).collect()[0]
    assert (r.w_tot, r.n_sampled, r.n_closed, r.exact_triangles) == (
        w_tot, n_sampled, n_closed, exact,
    )
    assert r.est_triangles == n_closed * w_tot // (3 * max(n_sampled, 1))


def test_hash_walks_matches_python(spark):
    from ocr_to_csv_spark.functions.walkops import (
        WALK_L,
        WALK_SEED_MOD,
        q_hash_walks,
    )

    ids = _ids()
    dir_edges, _ = _graph(ids)
    outn = {}
    for s, d in dir_edges:
        outn.setdefault(s, []).append(d)
    for v in outn:
        outn[v].sort()
    state = {i: i for i in ids if i % WALK_SEED_MOD == 0}
    gold = [(0, len(state), len(set(state.values())))]
    for step in range(1, WALK_L + 1):
        nxt = {}
        for w, cur in state.items():
            if cur in outn:
                ns = outn[cur]
                nxt[w] = ns[_h32(f"wk|{w}|{step}") % len(ns)]
        state = nxt
        gold.append((step, len(state), len(set(state.values()))))
    got = [
        (r.step, r.n_active, r.n_distinct_nodes)
        for r in q_hash_walks(spark, SF).collect()
    ]
    assert got == gold
    # active walks never increase (dangling nodes absorb)
    assert all(b[1] <= a[1] for a, b in zip(got, got[1:]))
