"""Batch 163: Morris counter + FM/PCSA sketch — python replay mirrors
and the estimator pins (Morris within 50% of the true count on these
streams; PCSA within a factor of ~2 of the exact distinct count)."""

import glob
import hashlib
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_morris_matches_python(spark):
    from ocr_to_csv_spark.functions.morrisops import (
        MO_COUNTERS, MO_STEPS, q_morris_counter,
    )

    exp = {}
    for a in range(MO_COUNTERS):
        c = 0
        for t in range(1, MO_STEPS + 1):
            u = _h32(f"mo|{a}|{t}") % (1 << 30)
            thresh = (1 << 30) >> c if c <= 30 else 0
            if u < thresh:
                c += 1
        est = (1 << c) - 1
        exp[a] = (c, est, 1000 * abs(est - MO_STEPS) // MO_STEPS)
    got = {
        r.counter_id: (r.c_final, r.est, r.err_milli)
        for r in q_morris_counter(spark, SF).collect()
    }
    assert got == exp
    # loglog storage: c stays near log2(n); estimates in a sane band
    for c, est, err in got.values():
        assert 8 <= c <= 14
        assert err <= 1000  # within 2x of the truth


def test_fm_sketch_matches_python(spark):
    from ocr_to_csv_spark.functions.morrisops import (
        FM_BITS, FM_M, FM_PHI_MICRO, q_fm_sketch,
    )

    files = sorted(glob.glob(f"{SF}/customer.parquet")) or sorted(
        glob.glob(f"{SF}/customer.parquet/*.parquet")
    )
    keys = sorted(
        int(k)
        for k in pd.concat(
            pd.read_parquet(f, columns=["c_custkey"]) for f in files
        ).c_custkey
    )
    bitmaps = [0] * FM_M
    for k in keys:
        h = _h32(f"fm|{k}")
        g = h % FM_M
        hv = h // FM_M
        rho = FM_BITS - 1
        for b in range(FM_BITS):
            if (hv >> b) & 1:
                rho = b
                break
        bitmaps[g] |= 1 << rho
    sum_r = 0
    for bm in bitmaps:
        r = FM_BITS
        for b in range(FM_BITS):
            if not (bm >> b) & 1:
                r = b
                break
        sum_r += r
    est = math.floor(
        FM_M * 2 ** (sum_r / FM_M) / (FM_PHI_MICRO / 1e6) * 1000
    )
    r = q_fm_sketch(spark, SF).collect()[0]
    assert (r.n_exact, r.sum_r, r.est_milli) == (len(keys), sum_r, est)
    # the sketch lands within a factor ~2 of the exact count
    assert len(keys) * 1000 // 2 <= r.est_milli <= len(keys) * 1000 * 2
