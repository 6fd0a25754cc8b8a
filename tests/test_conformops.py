"""Batch 157: Platt grid + split conformal — python mirrors, plus the
calibration pin (the chosen sigmoid's loss is the grid minimum) and
the conformal marginal-coverage guarantee (held-out coverage ≥ target
up to finite-sample slack)."""

import glob
import hashlib
import math

import pandas as pd

SF = "/root/testdata/sf0.001"
NANO = 1_000_000_000


def _docs():
    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    return pd.concat(
        pd.read_parquet(f, columns=["doc_id", "text", "lang", "n_chars"])
        for f in files
    )


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_platt_grid_matches_python(spark):
    from ocr_to_csv_spark.functions.conformops import (
        PLATT_A, PLATT_B, q_platt_grid,
    )
    from ocr_to_csv_spark.functions.textops import QC_BIAS, QC_BUCKETS

    rows = []
    for r in _docs().itertuples(index=False):
        s = QC_BIAS + sum(
            (_h32(t) % QC_BUCKETS) * 2654435761 % 1001 - 500
            for t in str(r.text).split()
            if t
        )
        rows.append((s, 1.0 if r.lang == "en" else -1.0))
    cands = [(a, b) for a in PLATT_A for b in PLATT_B]
    losses = []
    for a, b in cands:
        tot = 0
        for s, y in rows:
            z = (a * s + b * 1000) / 1e6
            tot += round(math.log(1 + math.exp(-y * z)) * NANO)
        losses.append(tot)
    key = min(
        loss * 32 + idx for idx, loss in enumerate(losses)
    )
    bi = key % 32
    r = q_platt_grid(spark, SF).collect()[0]
    assert r.n == len(rows)
    assert (r.a_milli, r.b_milli) == cands[bi]
    assert abs(r.loss_nano - losses[bi]) <= len(rows)  # 1 nano/term slack
    assert r.loss_nano * 32 <= min(
        loss * 32 + idx for idx, loss in enumerate(losses)
    ) + 32 * len(rows)


def test_conformal_matches_python_and_covers(spark):
    from ocr_to_csv_spark.functions.conformops import (
        ALPHA_MILLI, q_conformal_interval,
    )

    docs = _docs()
    rows = []
    for r in docs.itertuples(index=False):
        x = len([t for t in str(r.text).split() if t])
        rows.append((int(r.doc_id), x, int(r.n_chars)))
    cal = [(x, y) for d, x, y in rows if d % 2 == 0]
    tst = [(x, y) for d, x, y in rows if d % 2 == 1]
    n = len(cal)
    sx = sum(x for x, _ in cal)
    sy = sum(y for _, y in cal)
    sxy = sum(x * y for x, y in cal)
    sxx = sum(x * x for x, _ in cal)
    anum = n * sxy - sx * sy
    den = n * sxx - sx * sx
    bnum = sy * den - anum * sx

    def score(x, y):
        return abs(den * n * y - (n * anum * x + bnum))

    cs = sorted(score(x, y) for x, y in cal)
    k = math.ceil((n + 1) * (1000 - ALPHA_MILLI) / 1000)
    qhat = cs[k - 1]
    covered = sum(1 for x, y in tst if score(x, y) <= qhat)
    r = q_conformal_interval(spark, SF).collect()[0]
    assert (r.n_cal, r.n_test, r.k, r.qhat_scaled, r.n_covered) == (
        n, len(tst), k, qhat, covered,
    )
    assert r.cov_milli == 1000 * covered // len(tst)
    # marginal coverage guarantee with finite-sample slack
    assert r.cov_milli >= 1000 - ALPHA_MILLI - 60
