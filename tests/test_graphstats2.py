"""Batch 87: seed-set closeness / harmonic centrality."""

import glob
from collections import deque

import pandas as pd

SF = "/root/testdata/sf0.001"


def _py_bfs_state():
    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    d = pd.concat(pd.read_parquet(f, columns=["doc_id"]) for f in files)
    ids = sorted(int(x) for x in d.doc_id)
    n = len(ids)
    adj = {i: [] for i in ids}
    for i in ids:
        if i % 3 != 0:
            adj[i].append((i * 2 + 1) % n)
        if i % 2 == 0:
            adj[i].append((i * 7 + 3) % n)
        if i % 6 == 1:
            adj[i].append((i + n // 2) % n)
    from ocr_to_csv_spark.functions.graphstats2 import H_ROUNDS, SEED_MOD

    state = {}
    for seed in (i for i in ids if i % SEED_MOD == 0):
        dist = {seed: 0}
        q = deque([seed])
        while q:
            u = q.popleft()
            if dist[u] >= H_ROUNDS:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        state[seed] = dist
    return state


def test_closeness_matches_python_bfs(spark):
    from ocr_to_csv_spark.functions.graphstats2 import (
        H_ROUNDS,
        q_closeness_centrality,
    )

    state = _py_bfs_state()
    got = {r.seed: r for r in q_closeness_centrality(spark, SF).collect()}
    assert set(got) == set(state)
    for seed, dist in state.items():
        r = got[seed]
        assert r.n_reached == len(dist)
        assert r.sum_dist == sum(dist.values())
        assert r.ecc == max(dist.values())
        assert r.ecc <= H_ROUNDS
        assert r.closeness_num == len(dist) - 1
        assert r.closeness_den == sum(dist.values())


def test_harmonic_matches_python_bfs(spark):
    from ocr_to_csv_spark.functions.graphstats2 import (
        HARM_LCM,
        q_harmonic_centrality,
    )

    state = _py_bfs_state()
    want = {
        seed: sum(HARM_LCM // d for d in dist.values() if d >= 1)
        for seed, dist in state.items()
        if any(d >= 1 for d in dist.values())
    }
    got = {
        r.seed: r.harmonic_x60
        for r in q_harmonic_centrality(spark, SF).collect()
    }
    assert got == want
    assert want, "seeds must reach neighbors at this sf"
