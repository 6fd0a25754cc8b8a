"""Batch 155: JSD matrix + mutual information — python mirrors, plus
the information-theory pins (0 ≤ JSD ≤ ln 2 and symmetry by
construction; MI ≥ 0 with NMI in [0, 1000])."""

import glob
import math
from collections import Counter

import pandas as pd

SF = "/root/testdata/sf0.001"
NANO = 1_000_000_000


def _read(name, cols):
    files = sorted(glob.glob(f"{SF}/{name}.parquet")) or sorted(
        glob.glob(f"{SF}/{name}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def test_jsd_matrix_matches_python(spark):
    from ocr_to_csv_spark.functions.infoops import JSD_V, q_jsd_matrix

    docs = _read("documents", ["source", "text"])
    by_src = {}
    for r in docs.itertuples(index=False):
        by_src.setdefault(r.source, []).extend(
            t for t in str(r.text).lower().split() if t
        )
    tot = Counter()
    for toks in by_src.values():
        tot.update(toks)
    top = sorted(sorted(tot), key=lambda w: (-tot[w], w))[:JSD_V]
    words = sorted(top) + ["\x7f~oov"]
    dist = {}
    for src, toks in by_src.items():
        c = Counter(toks)
        n = len(toks)
        v = [c[w] / n for w in top]
        v_sorted = [
            c[w] / n for w in sorted(top)
        ]
        oov = (n - sum(c[w] for w in top)) / n
        dist[src] = v_sorted + [oov]
    srcs = sorted(by_src)
    exp = {}
    for i, a in enumerate(srcs):
        for j, b in enumerate(srcs):
            if i < j:
                d = 0.0
                for p, q in zip(dist[a], dist[b]):
                    if p > 0:
                        d += 0.5 * (p * math.log((2 * p) / (p + q)))
                    if q > 0:
                        d += 0.5 * (q * math.log((2 * q) / (p + q)))
                exp[(a, b)] = round(d, 9)
    got = {
        (r.src_a, r.src_b): r.jsd for r in q_jsd_matrix(spark, SF).collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 2e-9, k
    for v in got.values():
        assert -1e-12 <= v <= math.log(2) + 1e-12


def test_mutual_info_matches_python(spark):
    from ocr_to_csv_spark.functions.infoops import q_mutual_info
    from ocr_to_csv_spark.functions.rakingops import REGIONS, SEGMENTS

    c = _read("customer", ["c_custkey", "c_nationkey", "c_mktsegment"])
    n = _read("nation", ["n_nationkey", "n_regionkey"])
    rg = _read("region", ["r_regionkey", "r_name"])
    j = c.merge(n, left_on="c_nationkey", right_on="n_nationkey").merge(
        rg, left_on="n_regionkey", right_on="r_regionkey"
    )
    N = len(j)
    k = {}
    for s in SEGMENTS:
        for g in REGIONS:
            k[(s, g)] = int(((j.c_mktsegment == s) & (j.r_name == g)).sum())
    rr = {s: sum(k[(s, g)] for g in REGIONS) for s in SEGMENTS}
    cc = {g: sum(k[(s, g)] for s in SEGMENTS) for g in REGIONS}
    mi = sum(
        round(k[(s, g)] * math.log(k[(s, g)] * N / (rr[s] * cc[g])) * NANO)
        for s in SEGMENTS
        for g in REGIONS
        if k[(s, g)] > 0
    )
    hs = sum(
        round(rr[s] * math.log(N / rr[s]) * NANO)
        for s in SEGMENTS
        if rr[s] > 0
    )
    hg = sum(
        round(cc[g] * math.log(N / cc[g]) * NANO)
        for g in REGIONS
        if cc[g] > 0
    )
    r = q_mutual_info(spark, SF).collect()[0]
    assert r.n == N
    assert abs(r.mi_num_nano - mi) <= 30  # per-term nano rounding slack
    assert abs(r.h_seg_nano - hs) <= 10
    assert abs(r.h_reg_nano - hg) <= 10
    assert 0 <= r.nmi_milli <= 1000
