"""Batch 151: Holt-Winters + Croston — python mirrors of both
recursions, plus the degeneracy pins (on an all-nonzero series Croston's
interval estimate converges toward 1; HW seasonal slots sum near zero
at init by construction)."""

import glob

import pandas as pd

SF = "/root/testdata/sf0.001"


def _series():
    files = sorted(glob.glob(f"{SF}/events.parquet")) or sorted(
        glob.glob(f"{SF}/events.parquet/*.parquet")
    )
    ev = pd.concat(
        pd.read_parquet(f, columns=["event_type", "ts"]) for f in files
    )
    secs = (ev.ts - pd.Timestamp("1970-01-01")).dt.total_seconds()
    ev["day"] = (secs // 86400).astype(int)
    out = {}
    for typ, g in ev.groupby("event_type"):
        cnt = g.groupby("day").size()
        lo, hi = cnt.index.min(), cnt.index.max()
        out[typ] = [int(cnt.get(d, 0)) for d in range(lo, hi + 1)]
    return out


def test_holt_winters_matches_python(spark):
    from ocr_to_csv_spark.functions.hwops import (
        HW_A, HW_B, HW_G, HW_M, MIN_LEN, q_holt_winters,
    )

    exp = {}
    for typ, xs in _series().items():
        n = len(xs)
        if n < MIN_LEN:
            continue
        m1 = sum(xs[:HW_M]) / HW_M
        m2 = sum(xs[HW_M : 2 * HW_M]) / HW_M
        lvl, tr = m1, (m2 - m1) / HW_M
        season = [xs[i] - m1 for i in range(HW_M)]
        sse = 0.0
        for t in range(HW_M + 1, n + 1):
            x = float(xs[t - 1])
            idx = (t - 1) % HW_M
            si = season[idx]
            pred = lvl + tr + si
            newlvl = HW_A * (x - si) + (1 - HW_A) * (lvl + tr)
            newtr = HW_B * (newlvl - lvl) + (1 - HW_B) * tr
            newsi = HW_G * (x - newlvl) + (1 - HW_G) * si
            sse = sse + (x - pred) * (x - pred)
            lvl, tr, season[idx] = newlvl, newtr, newsi
        fc1 = lvl + 1 * tr + season[n % HW_M]
        fc7 = lvl + 7 * tr + season[(n + 6) % HW_M]
        exp[typ] = (
            n, round(lvl, 9), round(tr, 9), round(sse, 9),
            round(fc1, 9), round(fc7, 9),
        )
    got = {
        r.typ: (r.n, r.level, r.trend, r.sse, r.fc1, r.fc7)
        for r in q_holt_winters(spark, SF).collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        for a, b in zip(got[k][1:], exp[k][1:]):
            assert abs(a - b) < 2e-7, (k, a, b)


def test_croston_matches_python(spark):
    from ocr_to_csv_spark.functions.hwops import CR_A, MIN_LEN, q_croston

    exp = {}
    for typ, xs in _series().items():
        if len(xs) < MIN_LEN:
            continue
        inited, z, p, q, nd = False, 0.0, 0.0, 1.0, 0
        for x in xs:
            if x > 0:
                if not inited:
                    z, p, inited = float(x), q, True
                else:
                    z = z + CR_A * (x - z)
                    p = p + CR_A * (q - p)
                q = 1.0
                nd += 1
            else:
                q += 1.0
        if nd:
            exp[typ] = (len(xs), nd, round(z, 9), round(p, 9),
                        round(z / p, 9))
    got = {
        r.typ: (r.n, r.n_demand, r.z, r.p, r.forecast)
        for r in q_croston(spark, SF).collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0] and got[k][1] == exp[k][1]
        for a, b in zip(got[k][2:], exp[k][2:]):
            assert abs(a - b) < 2e-7, (k, a, b)
    # dense daily series: demand almost every day → p near 1
    for n, nd, z, p, f in got.values():
        if nd >= n - 2:
            assert p < 1.5
