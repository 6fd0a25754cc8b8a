"""Batch 154: fixed-effects within estimator + Mattson LRU stack —
python mirrors, plus the econometric pin (within ≠ pooled when entity
heterogeneity exists) and the cache-theory pin (hit counts monotone in
cache size; inclusion property of LRU)."""

import glob

import pandas as pd

SF = "/root/testdata/sf0.001"
NANO = 1_000_000_000


def _read(name, cols):
    files = sorted(glob.glob(f"{SF}/{name}.parquet")) or sorted(
        glob.glob(f"{SF}/{name}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def test_fe_within_matches_python(spark):
    from ocr_to_csv_spark.functions.panelops import FE_SCALE, q_fe_within

    o = _read("orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    li = _read("lineitem", ["l_orderkey"])
    nl = li.groupby("l_orderkey").size()
    o = o[o.o_orderkey.isin(nl.index)]
    o["x"] = o.o_orderkey.map(nl).astype("int64")
    o["y"] = (o.o_totalprice * 100).round().astype("int64")
    wnum = wden = 0
    tx = ty = txy = txx = nobs = 0
    ents = 0
    for ent, g in o.groupby("o_custkey"):
        ni = len(g)
        sx, sy = int(g.x.sum()), int(g.y.sum())
        sxy = int((g.x * g.y).sum())
        sxx = int((g.x * g.x).sum())
        wnum += round((ni * sxy - sx * sy) / ni * FE_SCALE)
        wden += round((ni * sxx - sx * sx) / ni * FE_SCALE)
        tx += sx
        ty += sy
        txy += sxy
        txx += sxx
        nobs += ni
        ents += 1
    sw = round(wnum / wden, 9)
    sp = round((nobs * txy - tx * ty) / (nobs * txx - tx * tx), 9)
    r = q_fe_within(spark, SF).collect()[0]
    assert (r.n_entities, r.n_obs) == (ents, nobs)
    assert abs(r.slope_within - sw) < 2e-6
    assert abs(r.slope_pooled - sp) < 2e-6
    # entity heterogeneity exists: within and pooled estimates differ
    assert r.slope_within != r.slope_pooled


def test_lru_stack_matches_python(spark):
    from ocr_to_csv_spark.functions.panelops import LRU_SIZES, q_lru_stack

    li = _read(
        "lineitem",
        ["l_suppkey", "l_orderkey", "l_linenumber", "l_partkey"],
    )
    hits = {c: 0 for c in LRU_SIZES}
    n_acc = 0
    n_streams = 0
    for supp, g in li.groupby("l_suppkey"):
        g = g.sort_values(["l_orderkey", "l_linenumber", "l_partkey"])
        rec = []
        n_streams += 1
        for p in g.l_partkey:
            p = int(p)
            n_acc += 1
            if p in rec:
                pos = rec.index(p) + 1
                for c in LRU_SIZES:
                    if pos <= c:
                        hits[c] += 1
                rec.remove(p)
            rec.insert(0, p)
    r = q_lru_stack(spark, SF).collect()[0]
    assert (r.n_accesses, r.n_streams) == (n_acc, n_streams)
    got = [getattr(r, f"hits_{c}") for c in LRU_SIZES]
    assert got == [hits[c] for c in LRU_SIZES]
    # LRU inclusion property: hits monotone nondecreasing in C
    assert got == sorted(got)
