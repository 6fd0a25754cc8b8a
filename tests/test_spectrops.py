"""Batch 136: period scan + PACF — python mirrors over the zero-filled
daily spine (exact fold scores; statsmodels-free Durbin–Levinson) and
the definitional pins (score zero iff perfectly flat buckets; pacf_1
equals rho_1)."""

import glob
import math

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


def test_period_scan_matches_python(spark):
    from ocr_to_csv_spark.functions.spectrops import (
        MIN_LEN, PS_MAX, PS_MIN, q_period_scan,
    )

    exp = {}
    for typ, xs in _series().items():
        if len(xs) < MIN_LEN:
            continue
        for p in range(PS_MIN, PS_MAX + 1):
            m = len(xs) // p
            used = xs[: m * p]
            tp = sum(used)
            score = 0
            for r in range(p):
                sr = sum(used[r::p])
                score += (p * sr - tp) ** 2
            exp[(typ, p)] = (m * p, score)
    got = {
        (r.typ, r.p): (r.n_used, r.score)
        for r in q_period_scan(spark, SF).collect()
    }
    assert got == exp
    # flat-bucket sanity: a constant series would score 0; real series don't
    assert any(v[1] > 0 for v in got.values())


def test_pacf_matches_python(spark):
    from ocr_to_csv_spark.functions.spectrops import (
        MIN_LEN, PACF_K, q_pacf,
    )

    exp = {}
    for typ, xs in _series().items():
        n = len(xs)
        if n < MIN_LEN:
            continue
        t = sum(xs)
        c = [
            sum(
                (n * xs[i] - t) * (n * xs[i + k] - t)
                for i in range(n - k)
            )
            for k in range(PACF_K + 1)
        ]
        rho = [None] + [c[k] / c[0] for k in range(1, PACF_K + 1)]
        phi = {(1, 1): rho[1]}
        for k in range(2, PACF_K + 1):
            num = rho[k] - sum(
                phi[(k - 1, j)] * rho[k - j] for j in range(1, k)
            )
            den = 1 - sum(phi[(k - 1, j)] * rho[j] for j in range(1, k))
            phi[(k, k)] = num / den
            for j in range(1, k):
                phi[(k, j)] = phi[(k - 1, j)] - phi[(k, k)] * phi[(k - 1, k - j)]
        for k in range(1, PACF_K + 1):
            exp[(typ, k)] = round(phi[(k, k)], 9)
    got = {(r.typ, r.lag): r.pacf for r in q_pacf(spark, SF).collect()}
    assert set(got) == set(exp)
    for key in exp:
        assert math.isclose(got[key], exp[key], abs_tol=2e-9), (
            key, got[key], exp[key],
        )
    # definitional: pacf at lag 1 IS the lag-1 autocorrelation, in [-1, 1]
    for (typ, lag), v in got.items():
        if lag == 1:
            assert -1.0 <= v <= 1.0
