"""Batch 128: Heaps fit + Fano factor — python mirrors and the law
sanities (vocab curve monotone & concave-ish: 0 < slope < 1000;
Fano ≥ 0)."""

import glob
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _tab(name, cols):
    files = sorted(glob.glob(f"{SF}/{name}.parquet")) or sorted(
        glob.glob(f"{SF}/{name}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def test_heaps_fit_matches_python(spark):
    from ocr_to_csv_spark.functions.corpusstats import HEAPS_K, q_heaps_fit

    d = _tab("documents", ["doc_id", "text"])
    n_docs = len(d)
    toks = [
        (int(r.doc_id), [t for t in str(r.text).split() if t])
        for r in d.itertuples(index=False)
    ]
    pts = []
    for k in range(1, HEAPS_K + 1):
        cut = k * n_docs // HEAPS_K
        nt = sum(len(ts) for did, ts in toks if did < cut)
        v = len({t for did, ts in toks if did < cut for t in ts})
        pts.append((k, nt, v))
    xs = [int(round(math.log(nt) * 1e6)) for _, nt, _ in pts]
    ys = [int(round(math.log(v) * 1e6)) for _, _, v in pts]
    K = HEAPS_K
    num = (K * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)) * 1000
    den = K * sum(x * x for x in xs) - sum(xs) ** 2
    slope = num // den
    got = [
        (r.k, r.n_tokens, r.vocab, r.slope_milli)
        for r in q_heaps_fit(spark, SF).collect()
    ]
    assert got == [(k, nt, v, slope) for k, nt, v in pts]
    # sub-linear growth always; this synthetic corpus's tiny fixed
    # vocabulary saturates instantly (slope ≈ 0) — precisely the
    # templated-corpus signature the audit exists to flag
    assert 0 <= slope < 1000
    assert all(b[2] >= a[2] for a, b in zip(pts, pts[1:]))  # monotone


def test_fano_factor_matches_python(spark):
    from ocr_to_csv_spark.functions.corpusstats import q_fano_factor

    e = _tab("events", ["event_type", "ts"])
    secs = (e.ts - pd.Timestamp("1970-01-01")).dt.total_seconds()
    day = (secs // 86400).astype("int64")
    gold = {}
    for typ, grp in day.groupby(e.event_type):
        lo, hi = int(grp.min()), int(grp.max())
        xs = [0] * (hi - lo + 1)
        for v in grp:
            xs[int(v) - lo] += 1
        n, S, S2 = len(xs), sum(xs), sum(x * x for x in xs)
        var_num = n * S2 - S * S
        gold[typ] = (n, S, var_num, var_num * 1000 // (n * S))
    got = {
        r.typ: (r.n_days, r.sum_c, r.var_num, r.fano_milli)
        for r in q_fano_factor(spark, SF).collect()
    }
    assert got == gold
    for v in got.values():
        assert v[2] >= 0
