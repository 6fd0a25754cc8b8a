"""Batch 172: Page-Hinkley + DDM — python replay mirrors of both
sequential detectors and the ordering invariants (alarm indices are
-1 or within [1, n]; DDM warn precedes or equals drift when both
fire)."""

import glob
import hashlib
import math

import pandas as pd


def _rhu(x: float) -> int:
    """Half-UP rounding (away from zero), matching Spark F.round /
    DuckDB round — Python's round() is banker's half-even and would
    diverge from both engines on an exact .5 nano tie (ADVICE r3)."""
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))

SF = "/root/testdata/sf0.001"
NANO = 1_000_000_000


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_page_hinkley_matches_python(spark):
    from ocr_to_csv_spark.functions.driftops import (
        MIN_LEN, PH_DELTA_NANO, PH_LAMBDA, q_page_hinkley,
    )

    files = sorted(glob.glob(f"{SF}/events.parquet")) or sorted(
        glob.glob(f"{SF}/events.parquet/*.parquet")
    )
    ev = pd.concat(
        pd.read_parquet(f, columns=["event_type", "ts"]) for f in files
    )
    secs = (ev.ts - pd.Timestamp("1970-01-01")).dt.total_seconds()
    ev["day"] = (secs // 86400).astype(int)
    exp = {}
    for typ, g in ev.groupby("event_type"):
        cnt = g.groupby("day").size()
        lo, hi = cnt.index.min(), cnt.index.max()
        xs = [int(cnt.get(d, 0)) for d in range(lo, hi + 1)]
        if len(xs) < MIN_LEN:
            continue
        t = s = m = mn = 0
        alarm = -1
        for x in xs:
            t += 1
            s += x
            dev = _rhu((x - s / t) * NANO) - PH_DELTA_NANO
            m += dev
            mn = min(mn, m)
            if alarm < 0 and m - mn > PH_LAMBDA * NANO:
                alarm = t
        exp[typ] = (len(xs), alarm, m, mn)
    got = {
        r.typ: (r.n, r.alarm_at, r.ph_final_nano, r.ph_min_nano)
        for r in q_page_hinkley(spark, SF).collect()
    }
    assert got == exp
    for n, alarm, m, mn in got.values():
        assert alarm == -1 or 1 <= alarm <= n


def test_ddm_matches_python(spark):
    from ocr_to_csv_spark.functions.driftops import q_ddm
    from ocr_to_csv_spark.functions.textops import QC_BIAS, QC_BUCKETS

    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    docs = pd.concat(
        pd.read_parquet(f, columns=["doc_id", "text", "lang"]) for f in files
    ).sort_values("doc_id")
    es = []
    for r in docs.itertuples(index=False):
        sc = QC_BIAS + sum(
            (_h32(t) % QC_BUCKETS) * 2654435761 % 1001 - 500
            for t in str(r.text).split()
            if t
        )
        es.append(int((sc > 0) != (r.lang == "en")))
    t = ne = 0
    psmin = smin = 1 << 60
    warn = drift = -1
    for e in es:
        t += 1
        ne += e
        p = ne / t
        s_ = math.sqrt(p * (1 - p) / t)
        ps_n = _rhu((p + s_) * NANO)
        s_n = _rhu(s_ * NANO)
        if ps_n < psmin:
            psmin, smin = ps_n, s_n
        if warn < 0 and ps_n > psmin + 2 * smin:
            warn = t
        if drift < 0 and ps_n > psmin + 3 * smin:
            drift = t
    r = q_ddm(spark, SF).collect()[0]
    assert (r.n, r.n_errors, r.warn_at, r.drift_at, r.psmin_nano) == (
        len(es), sum(es), warn, drift, psmin,
    )
    if r.warn_at > 0 and r.drift_at > 0:
        assert r.warn_at <= r.drift_at
