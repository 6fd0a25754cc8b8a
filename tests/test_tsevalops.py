"""Batch 129: MASE backtest + block bootstrap — python mirrors and the
metric semantics (MASE ratio definition; CI brackets the mean for
stationary-ish series; replicate determinism)."""

import glob
import hashlib
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _series():
    files = sorted(glob.glob(f"{SF}/events.parquet")) or sorted(
        glob.glob(f"{SF}/events.parquet/*.parquet")
    )
    e = pd.concat(
        pd.read_parquet(f, columns=["event_type", "ts"]) for f in files
    )
    secs = (e.ts - pd.Timestamp("1970-01-01")).dt.total_seconds()
    day = (secs // 86400).astype("int64")
    out = {}
    for typ, grp in day.groupby(e.event_type):
        lo, hi = int(grp.min()), int(grp.max())
        xs = [0] * (hi - lo + 1)
        for v in grp:
            xs[int(v) - lo] += 1
        out[typ] = xs
    return out


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_mase_backtest_matches_python(spark):
    from ocr_to_csv_spark.functions.tsevalops import (
        MASE_H,
        MASE_S,
        q_mase_backtest,
    )

    gold = {}
    for typ, xs in _series().items():
        n = len(xs)
        if n < MASE_H + MASE_S + 1:
            continue
        test = range(n - MASE_H, n)  # 0-based
        mm = sum(abs(xs[t] - xs[t - MASE_S]) for t in test)
        mn = sum(abs(xs[t] - xs[t - 1]) for t in test)
        gold[typ] = (n, mm, mn, mm * 1000 // mn if mn > 0 else None)
    got = {
        r.typ: (r.n_days, r.mae_model, r.mae_naive, r.mase_milli)
        for r in q_mase_backtest(spark, SF).collect()
    }
    assert got == gold


def test_block_bootstrap_matches_python(spark):
    from ocr_to_csv_spark.functions.tsevalops import (
        BB_B,
        BB_L,
        q_block_bootstrap,
    )

    gold = {}
    for typ, xs in _series().items():
        n = len(xs)
        if n < 2 * BB_L:
            continue
        n_blocks = math.ceil(n / BB_L)
        n_starts = n - BB_L + 1
        means = []
        for r in range(1, BB_B + 1):
            tot = 0
            for b in range(1, n_blocks + 1):
                start = _h32(f"bb|{typ}|{r}|{b}") % n_starts  # 0-based
                take = min(BB_L, n - (b - 1) * BB_L)
                tot += sum(xs[start : start + take])
            means.append(math.floor(tot * 1000 / n))
        means.sort()
        mean_milli = math.floor(sum(xs) * 1000 / n)
        gold[typ] = (n, mean_milli, means[0], means[BB_B - 1])
    got = {
        r.typ: (r.n_days, r.mean_milli, r.lo_milli, r.hi_milli)
        for r in q_block_bootstrap(spark, SF).collect()
    }
    assert got == gold
    # the band is ordered and non-degenerate-or-equal
    for _, (_, m, lo, hi) in got.items():
        assert lo <= hi
