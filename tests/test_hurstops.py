"""Batch 137: Hurst R/S + Kalman 1-D — python mirrors of the
exact-integer block R/S core and the local-level filter fold, plus
the Riccati-fixed-point convergence pin for the Kalman variance."""

import glob
import math

import pandas as pd

SF = "/root/testdata/sf0.001"
NANO = 1_000_000_000


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


def test_hurst_rs_matches_python(spark):
    from ocr_to_csv_spark.functions.hurstops import (
        MIN_LEN, RS_WINDOWS, q_hurst_rs,
    )

    exp = {}
    for typ, xs in _series().items():
        n = len(xs)
        if n < MIN_LEN:
            continue
        lnrs = {}
        nvs = {}
        for w in RS_WINDOWS:
            tot, nv = 0, 0
            for b in range(n // w):
                blk = xs[b * w : (b + 1) * w]
                tb = sum(blk)
                z, cur = [0], 0
                for x in blk:
                    cur += w * x - tb
                    z.append(cur)
                r = max(z) - min(z)
                s2 = sum((w * x - tb) ** 2 for x in blk)
                if s2 > 0:
                    tot += round(
                        (
                            math.log(r)
                            + 0.5 * math.log(w)
                            - 0.5 * math.log(s2)
                        )
                        * NANO
                    )
                    nv += 1
            lnrs[w] = round(tot / nv)
            nvs[w] = nv
        h = round(
            (lnrs[RS_WINDOWS[-1]] - lnrs[RS_WINDOWS[0]])
            / (2 * 0.6931471805599453 * 1000)
        )
        exp[typ] = (*[lnrs[w] for w in RS_WINDOWS],
                    *[nvs[w] for w in RS_WINDOWS], h)
    got = {
        r.typ: tuple(r)[1:] for r in q_hurst_rs(spark, SF).collect()
    }
    assert got == exp
    # a counting series is noisy-but-persistent: H lands in (0, 1.5e6)
    for v in got.values():
        assert -500_000 < v[-1] < 2_000_000


def test_kalman_1d_matches_python(spark):
    from ocr_to_csv_spark.functions.hurstops import (
        KAL_Q, KAL_R, MIN_LEN, q_kalman_1d,
    )

    exp = {}
    for typ, xs in _series().items():
        if len(xs) < MIN_LEN:
            continue
        xh, p = float(xs[0]), KAL_R
        for y in xs[1:]:
            ppred = p + KAL_Q
            k = ppred / (ppred + KAL_R)
            xh = xh + k * (y - xh)
            p = (1.0 - k) * ppred
        exp[typ] = (len(xs), round(xh, 9), round(p, 9))
    got = {
        r.typ: (r.n, r.xhat, r.pvar)
        for r in q_kalman_1d(spark, SF).collect()
    }
    assert got == exp
    # Riccati fixed point for Q=1,R=4: P* = (Q + sqrt(Q^2+4QR))/2 ≈ 2.5615..
    # then filtered P = P*R/(P*+R); after ~30 steps P has converged to it
    pstar = (1 + math.sqrt(1 + 16)) / 2
    pfilt = pstar * 4 / (pstar + 4)
    for _, (_, _, p) in got.items():
        assert abs(p - pfilt) < 1e-6
