"""Batch 140: Brier decomposition + closest pair — python mirrors,
Murphy-identity pin at picoscale, and the brute-force certificate that
the grid-bucketed closest pair IS the global closest pair."""

import glob
import hashlib

import pandas as pd

SF = "/root/testdata/sf0.001"


def _read(name, cols):
    files = sorted(glob.glob(f"{SF}/{name}.parquet")) or sorted(
        glob.glob(f"{SF}/{name}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_brier_decomp_matches_python(spark):
    from ocr_to_csv_spark.functions.brierops import BD_BINS, q_brier_decomp
    from ocr_to_csv_spark.functions.textops import QC_BIAS, QC_BUCKETS

    docs = _read("documents", ["doc_id", "text", "lang"])
    rows = []
    for r in docs.itertuples(index=False):
        s = QC_BIAS
        for t in str(r.text).split():
            if t:
                s += (_h32(t) % QC_BUCKETS) * 2654435761 % 1001 - 500
        rows.append((s, int(r.lang == "en")))
    lo = min(s for s, _ in rows)
    hi = max(s for s, _ in rows)
    binned = [
        ((1000 * (s - lo)) // (hi - lo + 1), lab) for s, lab in rows
    ]
    n = len(binned)
    ot = sum(lab for _, lab in binned)
    stats = {
        k: [0, 0, 0, 0, 0] for k in range(BD_BINS)
    }  # n, s, o, q, pl
    for p, lab in binned:
        k = (p * BD_BINS) // 1000
        st = stats[k]
        st[0] += 1
        st[1] += p
        st[2] += lab
        st[3] += p * p
        st[4] += p * lab
    obar = ot / n
    rel = sum(
        (st[1] / 1000 / st[0] - st[2] / st[0]) ** 2 * st[0]
        for st in stats.values()
        if st[0] > 0
    ) / n
    res = sum(
        (st[2] / st[0] - obar) ** 2 * st[0]
        for st in stats.values()
        if st[0] > 0
    ) / n
    unc = obar * (1 - obar)
    wbv = sum(
        (st[3] - st[1] * st[1] / st[0]) / 1_000_000
        for st in stats.values()
        if st[0] > 0
    ) / n
    wbc = -2 * sum(
        (st[4] - st[1] * st[2] / st[0]) / 1000
        for st in stats.values()
        if st[0] > 0
    ) / n
    sse = sum(
        st[3] - 2000 * st[4] + 1_000_000 * st[2] for st in stats.values()
    )
    brier = sse / 1_000_000 / n
    r = q_brier_decomp(spark, SF).collect()[0]
    assert r.n == n
    for name, val in (
        ("brier", brier), ("rel", rel), ("res", res),
        ("unc", unc), ("wbv", wbv), ("wbc", wbc),
    ):
        assert abs(getattr(r, name) - round(val, 9)) < 2e-9, (name,)
    # Murphy identity holds to picoscale
    assert abs(r.gap_pico) <= 2
    assert abs(brier - (rel - res + unc + wbv + wbc)) < 1e-12


def test_closest_pair_is_global_minimum(spark):
    from ocr_to_csv_spark.functions.brierops import (
        CP_UNIVERSE, q_closest_pair,
    )

    cust = _read("customer", ["c_custkey"])
    pts = {
        int(k): (
            _h32(f"cpx|{int(k)}") % CP_UNIVERSE,
            _h32(f"cpy|{int(k)}") % CP_UNIVERSE,
        )
        for k in cust.c_custkey
    }
    ids = sorted(pts)
    best = None
    for i, a in enumerate(ids):
        xa, ya = pts[a]
        for b in ids[i + 1 :]:
            xb, yb = pts[b]
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            cand = (d2, a, b)
            if best is None or cand < best:
                best = cand
    r = q_closest_pair(spark, SF).collect()[0]
    # bucketed result == brute-force global closest pair
    assert (r.min_d2, r.id_a, r.id_b) == best
    # and the candidate set really was subquadratic
    assert r.n_cand < len(ids) * (len(ids) - 1) // 2
