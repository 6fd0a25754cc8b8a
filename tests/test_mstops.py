"""Batch 74: Borůvka MSF + min incident edge."""

import pytest

SF = "/root/testdata/sf0.001"


def test_boruvka_equals_kruskal(spark):
    """Distributed Borůvka output is bit-identical to the independent
    pure-Python Kruskal under the strict (w, lo, hi) order."""
    from ocr_to_csv_spark.functions.mstops import (
        _py_kruskal,
        _py_weighted_edges,
        q_boruvka_msf,
    )

    got = sorted(
        (r.lo, r.hi, r.w) for r in q_boruvka_msf(spark, SF).collect()
    )
    want = _py_kruskal(_py_weighted_edges(SF))
    assert got == want


def test_msf_is_spanning_forest(spark):
    """|MSF| = V - C and the result is acyclic (union-find audit)."""
    from ocr_to_csv_spark.functions.mstops import (
        _py_weighted_edges,
        q_boruvka_msf,
    )

    rows = q_boruvka_msf(spark, SF).collect()
    edges = _py_weighted_edges(SF)
    nodes = {lo for _, lo, _ in edges} | {hi for _, _, hi in edges}

    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(r.lo), find(r.hi)
        assert ra != rb, f"cycle via edge ({r.lo},{r.hi})"
        parent[ra] = rb
    n_comp = len({find(v) for v in nodes})
    assert len(rows) == len(nodes) - n_comp
    # spanning: the graph's own components must match the forest's
    parent2 = {v: v for v in nodes}

    def find2(x):
        while parent2[x] != x:
            parent2[x] = parent2[parent2[x]]
            x = parent2[x]
        return x

    for _, lo, hi in edges:
        parent2[find2(lo)] = find2(hi)
    assert len({find2(v) for v in nodes}) == n_comp


def test_min_incident_is_msf_subset(spark):
    """Every node's minimum incident edge belongs to the (unique) MSF —
    the cut property, checked end-to-end across both queries."""
    from ocr_to_csv_spark.functions.mstops import (
        q_boruvka_msf,
        q_min_incident_edge,
    )

    msf = {
        (r.lo, r.hi) for r in q_boruvka_msf(spark, SF).collect()
    }
    for r in q_min_incident_edge(spark, SF).collect():
        assert (r.lo, r.hi) in msf


def test_msf_weight_is_minimal_vs_random_forests(spark):
    """Total MSF weight <= weight of any alternative spanning forest
    produced by a different (deterministic, non-minimal) edge order."""
    from ocr_to_csv_spark.functions.mstops import (
        _py_weighted_edges,
        q_boruvka_msf,
    )

    msf_w = sum(r.w for r in q_boruvka_msf(spark, SF).collect())
    edges = _py_weighted_edges(SF)

    def forest_weight(order):
        parent = {}

        def find(x):
            r = x
            while parent.setdefault(r, r) != r:
                r = parent[r]
            return r

        tot = 0
        for w, lo, hi in order:
            ra, rb = find(lo), find(hi)
            if ra != rb:
                parent[ra] = rb
                tot += w
        return tot

    alt = forest_weight(sorted(edges, key=lambda t: (t[1], t[2])))
    assert msf_w <= alt
    assert msf_w == forest_weight(sorted(edges))
