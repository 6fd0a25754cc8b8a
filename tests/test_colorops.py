"""Batch 148: JP coloring + vertex cover — mirrors at sf0.001, the
proper-coloring certificate (no edge monochromatic, ≤ Δ+1 colors) and
the vertex-cover certificate (every edge covered, |cover| ≤ 2·OPT via
the matching lower bound)."""

import glob

import pandas as pd

SF = "/root/testdata/sf0.001"


def _graph():
    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    ids = (
        pd.concat(pd.read_parquet(f, columns=["doc_id"]) for f in files)
        .doc_id.astype(int)
        .tolist()
    )
    n = len(ids)
    ue = set()
    for i in ids:
        raw = []
        if i % 3 != 0:
            raw.append((i * 2 + 1) % n)
        if i % 2 == 0:
            raw.append((i * 7 + 3) % n)
        if i % 6 == 1:
            raw.append((i + n // 2) % n)
        for dst in raw:
            if dst != i:
                ue.add((min(i, dst), max(i, dst)))
    return ue


def test_greedy_coloring_matches_python_and_is_proper(spark):
    from ocr_to_csv_spark.functions.colorops import (
        _py_jones_plassmann, q_greedy_coloring,
    )

    exp = dict(_py_jones_plassmann(SF))
    got = {r.id: r.color for r in q_greedy_coloring(spark, SF).collect()}
    assert got == exp
    ue = _graph()
    deg = {}
    for lo, hi in ue:
        deg[lo] = deg.get(lo, 0) + 1
        deg[hi] = deg.get(hi, 0) + 1
    for lo, hi in ue:
        assert got[lo] != got[hi], (lo, hi)
    assert max(got.values()) <= max(deg.values())  # <= Δ+1 colors (0-based)


def test_vertex_cover_is_valid_2_approx(spark):
    from ocr_to_csv_spark.functions.cascadeops import _py_greedy_matching
    from ocr_to_csv_spark.functions.colorops import q_vertex_cover

    got = {r.id: r.in_cover for r in q_vertex_cover(spark, SF).collect()}
    ue = _graph()
    # covers every edge
    for lo, hi in ue:
        assert got[lo] == 1 or got[hi] == 1, (lo, hi)
    # exactly the matching endpoints → |cover| = 2|M| ≤ 2·OPT
    m = _py_greedy_matching(SF)
    cover = {i for i, f in got.items() if f == 1}
    assert cover == {v for e in m for v in e}
    assert len(cover) == 2 * len(m)
