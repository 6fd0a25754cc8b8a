"""Batch 111: peak prominence + max drawdown — python mirrors with
scipy-matching prominence semantics and hand fixtures."""

import glob

import pandas as pd

SF = "/root/testdata/sf0.001"


def _events():
    files = sorted(glob.glob(f"{SF}/events.parquet")) or sorted(
        glob.glob(f"{SF}/events.parquet/*.parquet")
    )
    e = pd.concat(
        pd.read_parquet(
            f, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        for f in files
    )
    secs = (e.ts - pd.Timestamp("1970-01-01")).dt.total_seconds()
    e["day"] = (secs // 86400).astype(int)
    return e


def _py_prominences(xs):
    out = []
    n = len(xs)
    for i in range(1, n - 1):
        if not (xs[i] > xs[i - 1] and xs[i] > xs[i + 1]):
            continue
        l_bound = 0
        for j in range(i - 1, -1, -1):
            if xs[j] > xs[i]:
                l_bound = j + 1
                break
        r_bound = n - 1
        for j in range(i + 1, n):
            if xs[j] > xs[i]:
                r_bound = j - 1
                break
        lmin = min(xs[l_bound:i]) if l_bound < i else xs[i]
        rmin = min(xs[i + 1 : r_bound + 1]) if i < r_bound else xs[i]
        out.append((i, xs[i], xs[i] - max(lmin, rmin)))
    return out


def test_peak_prominence_matches_python(spark):
    from ocr_to_csv_spark.functions.peakops import q_peak_prominence

    e = _events()
    gold = {}
    for typ, grp in e.groupby("event_type"):
        counts = grp.groupby("day").size()
        lo, hi = counts.index.min(), counts.index.max()
        xs = [int(counts.get(d, 0)) for d in range(lo, hi + 1)]
        for pos, cnt, prom in _py_prominences(xs):
            gold[(typ, lo + pos)] = (cnt, prom)
    got = {
        (r.typ, r.day): (r.cnt, r.prominence)
        for r in q_peak_prominence(spark, SF).collect()
    }
    assert got == gold
    assert len(got) > 0
    # prominence never exceeds the peak height and is positive
    assert all(0 < p <= c for c, p in got.values())


def test_prominence_hand_fixture():
    # classic two-peak ridge: [0,3,1,2,0] → peaks at 3 (prom 3) and
    # 2 (prom 1: saddle at 1 toward the higher 3, right bound is end)
    assert _py_prominences([0, 3, 1, 2, 0]) == [(1, 3, 3), (3, 2, 1)]
    # monotone series has no peaks
    assert _py_prominences([1, 2, 3, 4]) == []


def test_max_drawdown_matches_python(spark):
    from ocr_to_csv_spark.functions.peakops import q_max_drawdown

    e = _events()
    e = e[e.user_id.notna()].copy()
    sign = e.event_type.map({"purchase": 1, "error": -1}).fillna(0)
    e["flow"] = (e.value * 100).round().astype(int) * sign.astype(int)
    gold = {}
    for uid, grp in e.sort_values(["ts", "event_id"]).groupby("user_id"):
        cums = grp.flow.cumsum()
        gold[int(uid)] = (
            len(grp),
            int(cums.max()),
            int(cums.iloc[-1]),
            int((cums.cummax() - cums).max()),
        )
    got = {
        r.user_id: (
            r.n_events, r.peak_cents, r.final_cents, r.max_drawdown_cents,
        )
        for r in q_max_drawdown(spark, SF).collect()
    }
    assert got == gold
    # the signed flow must actually dip somewhere (errors debit)
    assert any(d > 0 for _, _, _, d in got.values())
