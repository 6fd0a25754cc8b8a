"""Batch 94: Neyman allocation + capture-recapture."""

import glob
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _load(tbl, cols):
    files = sorted(glob.glob(f"{SF}/{tbl}.parquet")) or sorted(
        glob.glob(f"{SF}/{tbl}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def test_neyman_alloc_matches_python_and_sums_exactly(spark):
    from ocr_to_csv_spark.functions.sampleops import (
        LABEL_BUDGET,
        W_SCALE,
        q_neyman_alloc,
    )

    c = _load("customer", ["c_mktsegment", "c_acctbal"])
    moms = {}
    for _, r in c.iterrows():
        v = int(round(r.c_acctbal * 100))
        n, s, q = moms.get(r.c_mktsegment, (0, 0, 0))
        moms[r.c_mktsegment] = (n + 1, s + v, q + v * v)
    w = {
        seg: math.floor(W_SCALE * math.sqrt(float(n * q - s * s)))
        for seg, (n, s, q) in moms.items()
    }
    w_tot = sum(w.values())
    base = {seg: LABEL_BUDGET * x // w_tot for seg, x in w.items()}
    rem = {seg: (LABEL_BUDGET * x) % w_tot for seg, x in w.items()}
    leftover = LABEL_BUDGET - sum(base.values())
    order = sorted(w, key=lambda s: (-rem[s], s))
    alloc = {
        seg: base[seg] + (1 if i < leftover else 0)
        for i, seg in enumerate(order)
    }
    got = {r.seg: r for r in q_neyman_alloc(spark, SF).collect()}
    assert set(got) == set(moms)
    for seg in moms:
        assert got[seg].n == moms[seg][0]
        assert got[seg].w == w[seg]
        assert got[seg].base == base[seg]
        assert got[seg].alloc == alloc[seg]
    assert sum(r.alloc for r in got.values()) == LABEL_BUDGET
    # higher-dispersion strata must never get fewer labels per the
    # weight ordering (ties aside): the allocation is weight-monotone
    segs = sorted(moms, key=lambda s: w[s])
    for a, b in zip(segs, segs[1:]):
        assert got[a].alloc <= got[b].alloc + 1


def test_capture_recapture_matches_python(spark):
    from ocr_to_csv_spark.functions.sampleops import q_capture_recapture

    e = _load("events", ["user_id", "ts"])
    e = e[e.user_id.notna()]
    h0, h1 = set(), set()
    for _, r in e.iterrows():
        half = math.floor(r.ts.timestamp() / 86400) % 2
        (h0 if half == 0 else h1).add(int(r.user_id))
    m = len(h0 & h1)
    row = q_capture_recapture(spark, SF).collect()[0]
    assert (row.n1, row.n2, row.m) == (len(h0), len(h1), m)
    assert row.lp_num == len(h0) * len(h1) and row.lp_den == m
    assert row.chapman_num == (len(h0) + 1) * (len(h1) + 1)
    assert row.chapman_den == m + 1
    # estimate must be at least the observed union (textbook property)
    assert row.lp_num / max(row.lp_den, 1) >= len(h0 | h1) - 1e-9
