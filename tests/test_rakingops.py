"""Batch 152: IPF raking + Simpson diversity — python mirrors (the
full alternating-scaling recursion; the exact rational index), plus
the IPF pins (fitted total preserved, margins near target after K
rounds, zeros preserved)."""

import glob

import pandas as pd

SF = "/root/testdata/sf0.001"


def _read(name, cols):
    files = sorted(glob.glob(f"{SF}/{name}.parquet")) or sorted(
        glob.glob(f"{SF}/{name}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def _cells():
    c = _read("customer", ["c_custkey", "c_nationkey", "c_mktsegment"])
    n = _read("nation", ["n_nationkey", "n_regionkey"])
    r = _read("region", ["r_regionkey", "r_name"])
    j = c.merge(n, left_on="c_nationkey", right_on="n_nationkey").merge(
        r, left_on="n_regionkey", right_on="r_regionkey"
    )
    return j


def test_ipf_raking_matches_python(spark):
    from ocr_to_csv_spark.functions.rakingops import (
        D, IPF_ROUNDS, REGIONS, SEGMENTS, q_ipf_raking,
    )

    j = _cells()
    counts = {}
    for s in SEGMENTS:
        for g in REGIONS:
            counts[(s, g)] = int(
                ((j.c_mktsegment == s) & (j.r_name == g)).sum()
            )
    tot = sum(counts.values())
    w = {k: float(v) for k, v in counts.items()}
    target = tot / D
    for _ in range(IPF_ROUNDS):
        for s in SEGMENTS:
            rs = sum(w[(s, g)] for g in REGIONS)
            if rs > 0:
                for g in REGIONS:
                    w[(s, g)] = w[(s, g)] * (target / rs)
        for g in REGIONS:
            cs = sum(w[(s, g)] for s in SEGMENTS)
            if cs > 0:
                for s in SEGMENTS:
                    w[(s, g)] = w[(s, g)] * (target / cs)
    errs = [
        abs(sum(w[(s, g)] for g in REGIONS) - target) for s in SEGMENTS
    ] + [abs(sum(w[(s, g)] for s in SEGMENTS) - target) for g in REGIONS]
    merr = round(max(errs), 9)
    got = {
        (r.seg, r.region): (r.obs, r.fitted, r.margin_err)
        for r in q_ipf_raking(spark, SF).collect()
    }
    assert set(got) == set(counts)
    for k in counts:
        obs, fitted, margin_err = got[k]
        assert obs == counts[k]
        assert abs(fitted - round(w[k], 9)) < 2e-7, k
        assert abs(margin_err - merr) < 2e-7
    # IPF invariants: total mass preserved; margins converged; zeros stay
    assert abs(sum(v[1] for v in got.values()) - tot) < 1e-4
    assert merr < 0.5
    for k, v in counts.items():
        if v == 0:
            assert got[k][1] == 0.0


def test_simpson_diversity_matches_python(spark):
    from ocr_to_csv_spark.functions.rakingops import q_simpson_diversity

    c = _read("customer", ["c_custkey", "c_nationkey", "c_mktsegment"])
    n = _read("nation", ["n_nationkey", "n_name"])
    j = c.merge(n, left_on="c_nationkey", right_on="n_nationkey")
    exp = {}
    for nation, g in j.groupby("n_name"):
        ks = g.groupby("c_mktsegment").size()
        N = int(ks.sum())
        if N > 1:
            num = int(sum(k * (k - 1) for k in ks))
            exp[nation] = (
                N, num, N * (N - 1),
                1_000_000 - (1_000_000 * num) // (N * (N - 1)),
            )
    got = {
        r.nation: (r.n, r.num, r.den, r.d_micro)
        for r in q_simpson_diversity(spark, SF).collect()
    }
    assert got == exp
    for N, num, den, d in got.values():
        assert 0 <= d <= 1_000_000
