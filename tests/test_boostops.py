"""Batch 147: Pareto layers + exact AdaBoost — python mirrors (layer
peeling via brute-force dominance; the two-round boosting recursion
with rational weights), plus the pins: layers partition correctly
(no point dominated by its own layer) and the ensemble is at least as
accurate as the better single stump on training data... which AdaBoost
does NOT guarantee pointwise — so the pin is the weaker exact-identity
check against the mirror."""

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


def test_pareto_layers_matches_python(spark):
    from ocr_to_csv_spark.functions.boostops import PL_LAYERS, q_pareto_layers

    o = _read("orders", ["o_custkey", "o_totalprice"])
    o["cents"] = (o.o_totalprice * 100).round().astype("int64")
    prof = o.groupby("o_custkey").agg(
        spend=("cents", "sum"), cnt=("cents", "count")
    )
    pts = {
        int(k): (int(r.spend), int(r.cnt)) for k, r in prof.iterrows()
    }
    remaining = dict(pts)
    exp = {}
    for layer in range(1, PL_LAYERS + 1):
        front = []
        for a, (sa, ca) in remaining.items():
            dominated = any(
                (sb >= sa and cb >= ca and (sb > sa or cb > ca))
                for b, (sb, cb) in remaining.items()
                if b != a
            )
            if not dominated:
                front.append(a)
        for a in front:
            exp[a] = (pts[a][0], pts[a][1], layer)
            del remaining[a]
    got = {
        r.custkey: (r.spend, r.cnt, r.layer)
        for r in q_pareto_layers(spark, SF).collect()
    }
    assert got == exp
    # within a layer no point dominates another
    for a, (sa, ca, la) in got.items():
        for b, (sb, cb, lb) in got.items():
            if a != b and la == lb:
                assert not (sa >= sb and ca >= cb and (sa > sb or ca > cb))


def test_adaboost_matches_python(spark):
    from ocr_to_csv_spark.functions.boostops import (
        _panel, q_adaboost_stumps,
    )
    from ocr_to_csv_spark.functions.textops import QC_BIAS, QC_BUCKETS

    docs = _read("documents", ["doc_id", "text", "lang"])
    rows = []
    for r in docs.itertuples(index=False):
        toks = [t for t in str(r.text).split() if t]
        q = QC_BIAS + sum(
            (_h32(t) % QC_BUCKETS) * 2654435761 % 1001 - 500 for t in toks
        )
        rows.append((len(toks), q, int(r.lang == "en")))
    panel = _panel()

    def pred(row, stump):
        ft, thr, dr = stump
        v = row[0] if ft == "ln" else row[1]
        return int(v > thr) if dr == 1 else int(v <= thr)

    n = len(rows)
    errs = [
        sum(1 for row in rows if pred(row, s) != row[2]) for s in panel
    ]
    key1 = min(e * 64 + i for i, e in enumerate(errs))
    e1, i1 = key1 // 64, key1 % 64
    wrong1 = [pred(row, panel[i1]) != row[2] for row in rows]
    keys2 = []
    for i, s in enumerate(panel):
        a = sum(
            1 for row, w in zip(rows, wrong1) if w and pred(row, s) != row[2]
        )
        b = sum(
            1
            for row, w in zip(rows, wrong1)
            if not w and pred(row, s) != row[2]
        )
        keys2.append((a * (n - e1) + b * e1) * 64 + i)
    key2 = min(keys2)
    wnum2, i2 = key2 // 64, key2 % 64
    a2w = n * wnum2 < 2 * e1 * e1 * (n - e1)
    ens = 0
    for row in rows:
        p1, p2 = pred(row, panel[i1]), pred(row, panel[i2])
        p = p1 if p1 == p2 else (p2 if a2w else p1)
        ens += int(p == row[2])
    r = q_adaboost_stumps(spark, SF).collect()[0]
    assert (r.n, r.i1, r.e1, r.i2, r.wnum2, r.ens_correct) == (
        n, i1, e1, i2, wnum2, ens,
    )
    # boosting sanity: round-2 stump differs from round-1
    assert i1 != i2
