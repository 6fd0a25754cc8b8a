"""Batch 120: V-optimal histogram DP + Theil decomposition — python
mirrors and the defining semantics (DP cost decreases with more
buckets; Theil total ≥ between-group part; shares sum to ~1000)."""

import glob
import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

SF = "/root/testdata/sf0.001"


def _tab(name, cols):
    files = sorted(glob.glob(f"{SF}/{name}.parquet")) or sorted(
        glob.glob(f"{SF}/{name}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def _rhu(v):
    return int(Decimal(repr(float(v))).quantize(Decimal(1), ROUND_HALF_UP))


def test_vopt_hist_matches_python(spark):
    from ocr_to_csv_spark.functions.histops import VH_B, VH_C, q_vopt_hist

    o = _tab("orders", ["o_totalprice"])
    vs = [_rhu(v * 100) for v in o.o_totalprice]
    lo, hi1 = min(vs), max(vs) + 1
    w = (hi1 - lo + VH_C - 1) // VH_C
    c = [0] * VH_C
    for v in vs:
        c[(v - lo) // w] += 1
    p = [0] * (VH_C + 1)
    q = [0] * (VH_C + 1)
    for j in range(1, VH_C + 1):
        p[j] = p[j - 1] + c[j - 1]
        q[j] = q[j - 1] + c[j - 1] ** 2

    def sc(i, j):
        ln = j - i
        return math.floor(
            1000.0 * (ln * (q[j] - q[i]) - (p[j] - p[i]) ** 2) / ln
        )

    dp = {}
    for j in range(1, VH_C + 1):
        dp[(1, j)] = sc(0, j)
    for b in range(2, VH_B + 1):
        for j in range(b, VH_C + 1):
            dp[(b, j)] = min(
                dp[(b - 1, i)] + sc(i, j) for i in range(b - 1, j)
            )
    cut3 = next(
        i
        for i in range(VH_B - 1, VH_C)
        if dp[(VH_B - 1, i)] + sc(i, VH_C) == dp[(VH_B, VH_C)]
    )
    got = {
        r.n_buckets: (r.best_cost_milli, r.last_cut)
        for r in q_vopt_hist(spark, SF).collect()
    }
    assert got == {
        b: (dp[(b, VH_C)], cut3) for b in range(1, VH_B + 1)
    }
    # more buckets never hurt
    costs = [got[b][0] for b in range(1, VH_B + 1)]
    assert costs == sorted(costs, reverse=True)


def test_theil_decomp_matches_python(spark):
    from ocr_to_csv_spark.functions.histops import q_theil_decomp

    o = _tab("orders", ["o_custkey", "o_totalprice"])
    cst = _tab("customer", ["c_custkey", "c_nationkey"])
    nat = dict(zip(cst.c_custkey.astype(int), cst.c_nationkey.astype(int)))
    rev = {}
    for _, r in o.iterrows():
        k = int(r.o_custkey)
        rev[k] = rev.get(k, 0) + _rhu(r.o_totalprice * 100)
    x_tot = sum(rev.values())
    n_tot = len(rev)
    groups = {}
    for k, x in rev.items():
        g = nat[k] % 5
        n_g, x_g, t_g = groups.get(g, (0, 0, 0))
        t = _rhu(x / x_tot * math.log(x * n_tot / x_tot) * 1e9)
        groups[g] = (n_g + 1, x_g + x, t_g + t)
    gold = {}
    for g, (n_g, x_g, t_g) in groups.items():
        btw = _rhu(
            x_g / x_tot * math.log((x_g / x_tot) / (n_g / n_tot)) * 1e9
        )
        gold[g] = (n_g, x_g, t_g, btw, x_g * 1000 // x_tot)
    got = {
        r.grp: (r.n_g, r.x_g, r.t_total_nano, r.between_nano, r.share_milli)
        for r in q_theil_decomp(spark, SF).collect()
    }
    assert got == gold
    # Theil total ≥ between part (within-group inequality is ≥ 0),
    # up to nano rounding slack; shares sum to ~1000
    assert sum(v[2] for v in got.values()) >= sum(
        v[3] for v in got.values()
    ) - len(got)
    assert abs(sum(v[4] for v in got.values()) - 1000) <= len(got)
