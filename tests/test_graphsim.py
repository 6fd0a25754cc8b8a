"""Batch 135: Katz + SimRank — full python mirrors of the exact-integer
iterations over the shared link graph, plus the definitional pins
(Katz top-1 dominates walk counts; SimRank values bounded by SCALE and
symmetric by construction)."""

import glob

import pandas as pd

SF = "/root/testdata/sf0.001"


def _ids():
    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    return sorted(
        pd.concat(pd.read_parquet(f, columns=["doc_id"]) for f in files).doc_id
    )


def _edges(ids):
    n = len(ids)
    out = []
    for d in ids:
        if d % 3 != 0:
            out.append((d, (d * 2 + 1) % n))
        if d % 2 == 0:
            out.append((d, (d * 7 + 3) % n))
        if d % 6 == 1:
            out.append((d, (d + n // 2) % n))
    return out


def test_katz_matches_python(spark):
    from ocr_to_csv_spark.functions.graphsim import (
        KATZ_ROUNDS, KATZ_TOP, q_katz_centrality,
    )

    ids = _ids()
    edges = _edges(ids)
    s = {i: 0 for i in ids}
    for r in range(KATZ_ROUNDS):
        nxt = {i: 0 for i in ids}
        for u, v in edges:
            nxt[v] += s[u] + 8**r
        s = nxt
    exp = sorted(((i, x) for i, x in s.items()), key=lambda t: (-t[1], t[0]))
    got = [(r.doc_id, r.katz_scaled) for r in
           q_katz_centrality(spark, SF).collect()]
    assert got == exp[:KATZ_TOP]
    assert got[0][1] > 0


def test_simrank_matches_python(spark):
    from ocr_to_csv_spark.functions.graphsim import (
        SR_ROUNDS, SR_SCALE, SR_TOP, q_simrank,
    )

    ids = _ids()
    de = sorted(set(_edges(ids)))
    indeg = {}
    for _, v in de:
        indeg[v] = indeg.get(v, 0) + 1
    s = {(i, i): SR_SCALE for i in ids}
    for _ in range(SR_ROUNDS):
        # state ⋈ e1 ⋈ e2 on the pair endpoints
        by_src = {}
        for u, v in de:
            by_src.setdefault(u, []).append(v)
        nxt = {}
        for (u, v), val in s.items():
            for a in by_src.get(u, []):
                for b in by_src.get(v, []):
                    if a != b:
                        nxt[(a, b)] = nxt.get((a, b), 0) + val
        new = {(i, i): SR_SCALE for i in ids}
        for (a, b), t in nxt.items():
            sv = (4 * t) // (5 * indeg[a] * indeg[b])
            if sv > 0:
                new[(a, b)] = sv
        s = new
    cand = sorted(
        ((u, v, x) for (u, v), x in s.items() if u < v),
        key=lambda t: (-t[2], t[0], t[1]),
    )
    got = [(r.doc_a, r.doc_b, r.sim_scaled) for r in
           q_simrank(spark, SF).collect()]
    assert got == cand[:SR_TOP]
    for u, v, x in got:
        assert 0 < x <= SR_SCALE
        # symmetry: the mirrored pair carries the same value
        assert s.get((v, u)) == x
