"""Batch 125: AMS join estimate + priority sampling — python mirrors
and the estimator guarantees (AMS unbiasedness cross-check at small
scale; priority-sample total within a loose band of the exact)."""

import glob
import hashlib
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

SF = "/root/testdata/sf0.001"


def _tab(name, cols):
    files = sorted(glob.glob(f"{SF}/{name}.parquet")) or sorted(
        glob.glob(f"{SF}/{name}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _rhu(v):
    return int(Decimal(repr(float(v))).quantize(Decimal(1), ROUND_HALF_UP))


def test_ams_join_est_matches_python(spark):
    from ocr_to_csv_spark.functions.sketchest import AMS_J, q_ams_join_est

    o = _tab("orders", ["o_orderkey"]).o_orderkey.astype(int)
    li = _tab("lineitem", ["l_orderkey"]).l_orderkey.astype(int)

    def sign(j, k):
        return 1 if _h32(f"ams{j}|{k}") % 2 == 0 else -1

    sum_est = 0
    for j in range(1, AMS_J + 1):
        sa = sum(sign(j, k) for k in o)
        sb = sum(sign(j, k) for k in li)
        sum_est += sa * sb
    ca = o.value_counts()
    cb = li.value_counts()
    exact = int(sum(int(ca[k]) * int(cb[k]) for k in ca.index if k in cb))
    r = q_ams_join_est(spark, SF).collect()[0]
    assert (r.sum_est, r.n_sketches) == (sum_est, AMS_J)
    assert r.est_join == sum_est // AMS_J
    assert r.exact_join == exact
    assert r.abs_err == abs(r.est_join - exact)


def test_priority_sample_est_matches_python(spark):
    from ocr_to_csv_spark.functions.sketchest import (
        PS_K,
        PS_POW,
        q_priority_sample_est,
    )

    o = _tab("orders", ["o_orderkey", "o_orderstatus", "o_totalprice"])
    rows = []
    for r in o.itertuples(index=False):
        w = _rhu(r.o_totalprice * 100)
        q = (w * PS_POW) // (_h32(f"ps|{int(r.o_orderkey)}") + 1)
        rows.append((r.o_orderstatus, int(r.o_orderkey), w, q))
    ranked = sorted(rows, key=lambda t: (-t[3], t[1]))
    tau = ranked[PS_K][3]
    est, ns = {}, {}
    for s, _, w, _ in ranked[:PS_K]:
        est[s] = est.get(s, 0) + max(w, tau)
        ns[s] = ns.get(s, 0) + 1
    exact = {}
    for s, _, w, _ in rows:
        exact[s] = exact.get(s, 0) + w
    got = {
        r.status: (r.n_sampled, r.est_cents, r.exact_cents, r.tau)
        for r in q_priority_sample_est(spark, SF).collect()
    }
    assert got == {
        s: (ns.get(s, 0), est.get(s, 0), exact[s], tau if s in est else 0)
        for s in exact
    }
    # the total estimate is within a loose band of the exact total
    tot_est = sum(v[1] for v in got.values())
    tot_exact = sum(v[2] for v in got.values())
    assert 0.5 < tot_est / tot_exact < 2.0
