"""Batch 93: WOE/IV binning + PSI drift."""

import glob
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _load(tbl, cols):
    files = sorted(glob.glob(f"{SF}/{tbl}.parquet")) or sorted(
        glob.glob(f"{SF}/{tbl}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def test_woe_iv_matches_python_mirror(spark):
    from ocr_to_csv_spark.functions.statsops5 import (
        BIN_W,
        N_BINS_K,
        RND,
        q_woe_iv,
    )

    o = _load("orders", ["o_orderkey", "o_totalprice"])
    li = _load("lineitem", ["l_orderkey", "l_returnflag"])
    bad = set(li[li.l_returnflag == "R"].l_orderkey.astype(int))
    bins = {}
    for _, r in o.iterrows():
        b = math.floor(r.o_totalprice / BIN_W)
        g, z = bins.get(b, (0, 0))
        if int(r.o_orderkey) in bad:
            bins[b] = (g, z + 1)
        else:
            bins[b] = (g + 1, z)
    g_tot = sum(g for g, _ in bins.values())
    b_tot = sum(z for _, z in bins.values())
    got = {r.bin: r for r in q_woe_iv(spark, SF).collect()}
    assert set(got) == set(bins)
    iv_total = 0.0
    for b, (g, z) in bins.items():
        woe = round(
            math.log(((g + 1) * (b_tot + N_BINS_K))
                     / ((z + 1) * (g_tot + N_BINS_K))),
            RND,
        )
        term = round(
            ((g + 1) / (g_tot + N_BINS_K) - (z + 1) / (b_tot + N_BINS_K))
            * woe,
            RND,
        )
        assert got[b].n_good == g and got[b].n_bad == z
        assert got[b].woe == woe
        assert got[b].iv_term == term
        iv_total += term
    assert iv_total >= 0.0  # IV terms sum to a nonnegative divergence


def test_psi_matches_python_mirror(spark):
    from ocr_to_csv_spark.functions.statsops5 import RND, q_psi_drift

    e = _load("events", ["ts", "event_type"])
    cnt = {}
    for _, r in e.iterrows():
        half = math.floor(r.ts.timestamp() / 86400) % 2
        key = (r.event_type, half)
        cnt[key] = cnt.get(key, 0) + 1
    types = sorted({t for t, _ in cnt})
    k = len(types)
    t0 = sum(cnt.get((t, 0), 0) for t in types)
    t1 = sum(cnt.get((t, 1), 0) for t in types)
    terms = []
    for t in types:
        c0, c1 = cnt.get((t, 0), 0), cnt.get((t, 1), 0)
        lr = round(
            math.log(((c0 + 1) * (t1 + k)) / ((c1 + 1) * (t0 + k))), RND
        )
        terms.append(
            round(((c0 + 1) / (t0 + k) - (c1 + 1) / (t1 + k)) * lr, RND)
        )
    psi = 0.0
    for x in sorted(terms):
        psi += x
    row = q_psi_drift(spark, SF).collect()[0]
    assert row.n_types == k and row.t0 == t0 and row.t1 == t1
    assert row.psi == psi
    assert row.psi >= 0.0  # PSI is a symmetrized KL — nonnegative
