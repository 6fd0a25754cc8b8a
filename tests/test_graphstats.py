"""Batch 62: hand-computed fixtures for Adamic-Adar and degree
assortativity.

The synthetic link graph is a pure function of n = |documents| (same
modular construction as pagerank/common_neighbors), so the fixtures
pin tiny n and recompute both metrics with an independent textbook
implementation in plain Python."""

import math

from ocr_to_csv_spark.functions.graphstats import (
    TR_SCALE,
    TR_SEED_MOD,
    q_trustrank,
    K_TRUSS,
    q_ball2_size,
    q_edge_support,
    AA_LUT,
    AA_MAX_DEG,
    AA_SCALE,
    q_adamic_adar,
    q_assortativity,
)

DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _write_docs(spark, tmp_path, n):
    rows = [(i, f"doc {i}", "en", "web", 5) for i in range(n)]
    spark.createDataFrame(rows, DOCS_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _edges(n):
    """Independent reimplementation of the modular link graph."""
    raw = set()
    for i in range(n):
        if i % 3 != 0:
            raw.add((i, (i * 2 + 1) % n))
        if i % 2 == 0:
            raw.add((i, (i * 7 + 3) % n))
        if i % 6 == 1:
            raw.add((i, (i + n // 2) % n))
    return {
        (min(a, b), max(a, b)) for a, b in raw if a != b
    }


def _degrees(edges):
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


def test_adamic_adar_textbook(spark, tmp_path):
    n = 12
    sf = _write_docs(spark, tmp_path, n)
    edges = _edges(n)
    deg = _degrees(edges)
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    expect = {}
    nodes = sorted(nbrs)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) in edges:
                continue
            common = nbrs[a] & nbrs[b]
            if not common:
                continue
            aa = sum(AA_LUT[min(deg[z], AA_MAX_DEG)] for z in common)
            expect[(a, b)] = (len(common), aa)
    rows = q_adamic_adar(spark, sf).collect()
    got = {(r["a"], r["b"]): (r["cn"], r["aa_scaled"]) for r in rows}
    assert got == dict(
        sorted(expect.items(), key=lambda kv: (-kv[1][1], kv[0]))[: len(got)]
    )
    for r in rows:
        assert r["aa"] == r["aa_scaled"] / AA_SCALE


def test_aa_lut_matches_log():
    assert AA_LUT[2] == round(AA_SCALE / math.log(2))
    assert AA_LUT[AA_MAX_DEG] == round(AA_SCALE / math.log(AA_MAX_DEG))


def test_assortativity_textbook(spark, tmp_path):
    n = 12
    sf = _write_docs(spark, tmp_path, n)
    edges = _edges(n)
    deg = _degrees(edges)
    m = len(edges)
    s_jk = sum(deg[a] * deg[b] for a, b in edges)
    s_sum = sum(deg[a] + deg[b] for a, b in edges)
    s_sq = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in edges)
    row = q_assortativity(spark, sf).collect()[0]
    assert (row["m"], row["s_jk"], row["s_sum"], row["s_sq"]) == (
        m,
        s_jk,
        s_sum,
        s_sq,
    )
    num = 4 * m * s_jk - s_sum * s_sum
    den = 2 * m * s_sq - s_sum * s_sum
    assert (row["r_num"], row["r_den"]) == (num, den)
    assert row["r"] == num / den
    # sanity vs the float textbook formula over ordered endpoints
    pairs = [(deg[a], deg[b]) for a, b in edges] + [
        (deg[b], deg[a]) for a, b in edges
    ]
    mean_j = sum(j for j, _ in pairs) / len(pairs)
    cov = sum(j * k for j, k in pairs) / len(pairs) - mean_j**2
    var = sum(j * j for j, _ in pairs) / len(pairs) - mean_j**2
    assert abs(row["r"] - cov / var) < 1e-9


def test_edge_support_textbook(spark, tmp_path):
    n = 12
    sf = _write_docs(spark, tmp_path, n)
    edges = _edges(n)
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    expect = {
        (a, b): len(nbrs[a] & nbrs[b]) for a, b in edges
    }
    rows = q_edge_support(spark, sf).collect()
    got = {(r["lo"], r["hi"]): r["support"] for r in rows}
    assert got == expect
    for r in rows:
        assert r["in_truss"] == (1 if r["support"] >= K_TRUSS - 2 else 0)


def test_ball2_size_textbook(spark, tmp_path):
    n = 12
    sf = _write_docs(spark, tmp_path, n)
    edges = _edges(n)
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    rows = q_ball2_size(spark, sf).collect()
    for r in rows:
        node = r["node"]
        one = nbrs[node]
        two = set().union(*(nbrs[z] for z in one)) | one
        two.discard(node)
        assert r["ball1"] == len(one)
        assert r["ball2"] == len(two)


def test_trustrank_seeds_and_conservation(spark, tmp_path):
    n = 20
    sf = _write_docs(spark, tmp_path, n)
    rows = {r["doc_id"]: r for r in q_trustrank(spark, sf).collect()}
    assert len(rows) == n
    # seed flag matches the mod rule
    for i, r in rows.items():
        assert r["is_seed"] == (1 if i % TR_SEED_MOD == 0 else 0)
    # textbook mirror: 3 integer fixed-point supersteps
    edges = []
    for i in range(n):
        if i % 3 != 0:
            edges.append((i, (i * 2 + 1) % n))
        if i % 2 == 0:
            edges.append((i, (i * 7 + 3) % n))
        if i % 6 == 1:
            edges.append((i, (i + n // 2) % n))
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {i: (TR_SCALE if i % TR_SEED_MOD == 0 else 0) for i in range(n)}
    base = TR_SCALE * 15 // 100
    for _ in range(3):
        inc = {i: 0 for i in range(n)}
        for s, d in edges:
            inc[d] += (r[s] * 85 // 100) // deg[s]
        r = {
            i: (base if i % TR_SEED_MOD == 0 else 0) + inc[i]
            for i in range(n)
        }
    assert {i: rows[i]["trust_units"] for i in range(n)} == r
    # non-seed nodes only hold propagated (not teleported) mass
    assert all(
        rows[i]["trust_units"] < TR_SCALE for i in range(n) if i % TR_SEED_MOD
    )
