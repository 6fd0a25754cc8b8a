"""Batch 114: IV/2SLS + synthetic control — python mirrors and the
defining semantics (IV = Wald ratio of covariances; synthetic weights
minimize pre-period SSE over the integer simplex)."""

import glob
from datetime import date
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

SF = "/root/testdata/sf0.001"


def _round_half_up(v: float) -> int:
    """Mirror Spark's F.round on double: shortest-decimal repr of the
    float, then HALF_UP at scale 0 (same as BigDecimal.valueOf)."""
    return int(Decimal(repr(float(v))).quantize(Decimal(1), ROUND_HALF_UP))


def _tab(name, cols):
    files = sorted(glob.glob(f"{SF}/{name}.parquet")) or sorted(
        glob.glob(f"{SF}/{name}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def test_iv_2sls_matches_python(spark):
    from ocr_to_csv_spark.functions.synthops import q_iv_2sls

    li = _tab("lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
    z = (li.l_partkey % 5).astype("int64")
    x = li.l_quantity.astype("int64")
    y = (li.l_extendedprice * (1 - li.l_discount) * 100).map(_round_half_up)
    n = len(li)
    sz, sx, sy = int(z.sum()), int(x.sum()), int(y.sum())
    szz, szx, szy = int((z * z).sum()), int((z * x).sum()), int((z * y).sum())
    r = q_iv_2sls(spark, SF).collect()[0]
    assert r.n == n
    assert r.cov_zy_num == n * szy - sz * sy
    assert r.cov_zx_num == n * szx - sz * sx
    assert r.var_z_num == n * szz - sz * sz
    assert r.beta_iv == round(r.cov_zy_num / r.cov_zx_num, 9)
    assert r.stage1_slope == round(r.cov_zx_num / r.var_z_num, 9)


def test_synth_control_matches_python(spark):
    from ocr_to_csv_spark.functions.synthops import (
        N_WEEKS,
        PRE_WEEKS,
        SIMPLEX,
        q_synth_control,
    )

    o = _tab("orders", ["o_custkey", "o_orderdate", "o_totalprice"])
    base = date(1995, 1, 1)
    panel = {}
    for _, r in o.iterrows():
        d = r.o_orderdate
        d = d.date() if hasattr(d, "date") else d
        days = (d - base).days
        if days < 0 or days // 7 >= N_WEEKS:
            continue
        k = (int(r.o_custkey) % 4, days // 7)
        panel[k] = panel.get(k, 0) + _round_half_up(r.o_totalprice * 100)
    dollars = {k: v // 100 for k, v in panel.items()}
    weeks = sorted({w for _, w in dollars})
    best = None
    for w1, w2, w3 in SIMPLEX:
        sse = gap = 0
        for w in weeks:
            diff = 10 * dollars.get((0, w), 0) - (
                w1 * dollars.get((1, w), 0)
                + w2 * dollars.get((2, w), 0)
                + w3 * dollars.get((3, w), 0)
            )
            if w < PRE_WEEKS:
                sse += diff * diff
            else:
                gap += diff
        key = (sse, w1, w2, w3, gap, len(weeks))
        if best is None or key < best:
            best = key
    r = q_synth_control(spark, SF).collect()[0]
    assert (r.pre_sse, r.w1, r.w2, r.w3, r.post_gap10, r.n_weeks) == best
    # the simplex constraint held on the winner
    assert r.w1 + r.w2 + r.w3 == 10
