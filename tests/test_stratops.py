"""Batch 171: Simpson audit + Cochran Q — python mirrors and the
definitional pins (the pooled 2x2 equals the stratum sums; Q >= 0 and
I2 in [0, 1000]; the paradox flag fires iff pooled sign opposes a
unanimous stratum sign)."""

import glob

import pandas as pd

SF = "/root/testdata/sf0.001"
NANO = 1_000_000_000


def _read(name, cols):
    files = sorted(glob.glob(f"{SF}/{name}.parquet")) or sorted(
        glob.glob(f"{SF}/{name}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def _cells():
    o = _read("orders", ["o_orderkey", "o_custkey", "o_totalprice",
                         "o_orderdate"])
    li = _read("lineitem", ["l_orderkey", "l_shipdate"])
    c = _read("customer", ["c_custkey", "c_mktsegment"])
    fs = li.groupby("l_orderkey").l_shipdate.min()
    o = o[o.o_orderkey.isin(fs.index)].copy()
    o["first_ship"] = o.o_orderkey.map(fs)
    o["prompt"] = (
        (o.first_ship - o.o_orderdate).dt.days <= 30
    ).astype(int)
    o["hv"] = (o.o_totalprice > 150000).astype(int)
    o = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    cells = {}
    for seg, g in o.groupby("c_mktsegment"):
        a = int(((g.hv == 1) & (g.prompt == 1)).sum())
        b = int(((g.hv == 1) & (g.prompt == 0)).sum())
        cc = int(((g.hv == 0) & (g.prompt == 1)).sum())
        d = int(((g.hv == 0) & (g.prompt == 0)).sum())
        cells[seg] = (a, b, cc, d)
    return cells


def _sign(x):
    return (x > 0) - (x < 0)


def test_simpson_matches_python(spark):
    from ocr_to_csv_spark.functions.stratops import q_simpson_paradox

    cells = _cells()
    got = {
        r.seg: (r.a, r.b, r.c, r.d, r.sign, r.paradox)
        for r in q_simpson_paradox(spark, SF).collect()
    }
    for seg, (a, b, c, d) in cells.items():
        assert got[seg] == (a, b, c, d, _sign(a * d - b * c), 0), seg
    A = sum(v[0] for v in cells.values())
    B = sum(v[1] for v in cells.values())
    C = sum(v[2] for v in cells.values())
    D = sum(v[3] for v in cells.values())
    signs = {_sign(a * d - b * c) for a, b, c, d in cells.values()}
    psgn = _sign(A * D - B * C)
    paradox = int(psgn != 0 and len(signs) == 1
                  and psgn != next(iter(signs)))
    assert got["__POOLED__"] == (A, B, C, D, psgn, paradox)


def test_cochran_q_matches_python(spark):
    from ocr_to_csv_spark.functions.stratops import q_cochran_q

    cells = _cells()
    per = []
    for seg in sorted(cells):
        a, b, c, d = cells[seg]
        dn = round((a / (a + b) - c / (c + d)) * NANO)
        w = round(1.0 / (a * b / (a + b) ** 3 + c * d / (c + d) ** 3))
        per.append((seg, dn, w))
    k = len(per)
    swd = sum(w * dn for _, dn, w in per)
    sw = sum(w for _, _, w in per)
    pooled = round(swd / sw)
    q = 0.0
    for _, dn, w in sorted(per):
        q += w * ((dn - pooled) / NANO) ** 2
    q = round(q, 9)
    r = q_cochran_q(spark, SF).collect()[0]
    assert (r.k, r.pooled_nano) == (k, pooled)
    assert abs(r.q - q) < 2e-6
    assert r.q >= 0 and 0 <= r.i2_milli <= 1000
