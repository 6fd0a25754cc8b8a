"""Batch 109: clustering coefficient + transitivity — python mirror
over the symmetric closure and the ratio identities."""

import glob
from collections import defaultdict

import pandas as pd

SF = "/root/testdata/sf0.001"


def _graph_py():
    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    ids = pd.concat(
        [pd.read_parquet(f, columns=["doc_id"]) for f in files]
    )["doc_id"].astype(int).tolist()
    n = len(ids)
    edges = set()
    for i in ids:
        if i % 3 != 0:
            edges.add((i, (i * 2 + 1) % n))
        if i % 2 == 0:
            edges.add((i, (i * 7 + 3) % n))
        if i % 6 == 1:
            edges.add((i, (i + n // 2) % n))
    und = {
        (min(a, b), max(a, b)) for a, b in edges if a != b
    }
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    return und, adj


def test_clustering_coeff_matches_python(spark):
    from ocr_to_csv_spark.functions.ccoeffops import q_clustering_coeff

    und, adj = _graph_py()
    tri = {v: 0 for v in adj}
    for lo, hi in und:
        common = adj[lo] & adj[hi]
        for c in common:
            if c > hi:  # count each triangle once at its max corner
                tri[lo] += 1
                tri[hi] += 1
                tri[c] += 1
    got = {r.node: r for r in q_clustering_coeff(spark, SF).collect()}
    assert set(got) == set(adj)
    for v in adj:
        r = got[v]
        assert r.deg == len(adj[v])
        assert r.tri == tri[v]
        assert r.cc_num == 2 * tri[v]
        assert r.cc_den == len(adj[v]) * (len(adj[v]) - 1)
        if r.cc_den > 0:
            assert r.cc == r.cc_num / r.cc_den
        else:
            assert r.cc is None
    # the graph has real triangle structure somewhere
    assert any(r.tri > 0 for r in got.values())


def test_transitivity_identities(spark):
    from ocr_to_csv_spark.functions.ccoeffops import (
        q_clustering_coeff,
        q_transitivity,
    )

    cc = q_clustering_coeff(spark, SF).collect()
    r = q_transitivity(spark, SF).collect()[0]
    assert r.n_nodes == len(cc)
    assert r.n_wedges == sum(x.deg * (x.deg - 1) // 2 for x in cc)
    # Σ_v tri(v) = 3 · n_tri (each triangle has three corners)
    assert sum(x.tri for x in cc) == 3 * r.n_tri
    assert r.trans_num == 3 * r.n_tri
    assert r.trans_den == r.n_wedges
    assert r.transitivity == r.trans_num / r.trans_den
    assert 0 < r.transitivity < 1
