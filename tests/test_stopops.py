"""Batch 162: secretary + prophet — python replay mirrors and the
theory pins (secretary success in the 1/e band; prophet mean payoff
ratio above the 1/2 guarantee minus finite-sample slack)."""

import glob
import hashlib
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _vals(m):
    from ocr_to_csv_spark.functions.stopops import N_CAND

    return [_h32(f"sec|{m}|{i}") for i in range(1, N_CAND + 1)]


def test_secretary_matches_python(spark):
    from ocr_to_csv_spark.functions.stopops import (
        M_STREAMS, N_CAND, SKIP, q_secretary_stop,
    )

    succ = 0
    for m in range(M_STREAMS):
        v = _vals(m)
        record = max(v[:SKIP])
        pick = N_CAND - 1
        for i in range(SKIP, N_CAND):
            if v[i] > record:
                pick = i
                break
        succ += int(v[pick] == max(v))
    r = q_secretary_stop(spark, SF).collect()[0]
    assert (r.n_streams, r.n_cand, r.skip, r.n_success) == (
        M_STREAMS, N_CAND, SKIP, succ,
    )
    assert r.success_milli == succ * 1000 // M_STREAMS
    # 1/e ≈ 368: the empirical rate lands in a generous band
    assert 150 <= r.success_milli <= 650


def test_prophet_matches_python(spark):
    from ocr_to_csv_spark.functions.stopops import (
        M_STREAMS, MEDIAN, N_CAND, q_prophet_threshold,
    )

    tot = 0
    for m in range(M_STREAMS):
        v = _vals(m)
        pick = N_CAND - 1
        for i in range(N_CAND):
            if v[i] >= MEDIAN:
                pick = i
                break
        tot += math.floor(1000 * v[pick] / max(v))
    r = q_prophet_threshold(spark, SF).collect()[0]
    assert (r.n_streams, r.n_cand, r.total_ratio_milli) == (
        M_STREAMS, N_CAND, tot,
    )
    assert r.mean_ratio_milli == math.floor(tot / M_STREAMS)
    # prophet inequality: expected payoff >= max/2; allow sampling slack
    assert r.mean_ratio_milli >= 450
