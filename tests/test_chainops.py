"""Batch 122: hitting time + journey entropy — python mirrors of the
transition extraction and the K-step value iterations, plus the
absorbing-chain sanities (h ≥ 1 for observed states; journey surprisal
≥ the first step's entropy)."""

import glob
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _events():
    files = sorted(glob.glob(f"{SF}/events.parquet")) or sorted(
        glob.glob(f"{SF}/events.parquet/*.parquet")
    )
    return pd.concat(
        pd.read_parquet(f, columns=["user_id", "event_id", "ts", "event_type"])
        for f in files
    )


def _counts():
    from ocr_to_csv_spark.functions.attribution2 import _A_STATES, _B_STATES

    e = _events()
    e = e[e.user_id.notna()].copy()
    e["sec"] = ((e.ts - pd.Timestamp("1970-01-01")).dt.total_seconds()).astype(
        "int64"
    )
    cnt = {}
    for _, grp in e.groupby("user_id"):
        g = grp.sort_values(["sec", "event_id"])
        sts = [
            "CONV" if t == "purchase" else t for t in g.event_type
        ]
        if "CONV" in sts:
            sts = sts[: sts.index("CONV") + 1]
            ended = True
        else:
            ended = False
        prev = "START"
        for s in sts:
            cnt[(prev, s)] = cnt.get((prev, s), 0) + 1
            prev = s
        if not ended:
            cnt[(sts[-1], "NULL")] = cnt.get((sts[-1], "NULL"), 0) + 1
    p = {}
    for a in _A_STATES:
        tot = sum(cnt.get((a, b), 0) for b in _B_STATES)
        for b in _B_STATES:
            p[(a, b)] = cnt.get((a, b), 0) / tot if tot > 0 else 0.0
    return p, _A_STATES, _B_STATES


def test_hitting_time_matches_python(spark):
    from ocr_to_csv_spark.functions.chainops import CH_K, q_hitting_time

    p, A, B = _counts()
    trans = [a for a in A if a != "START"]
    h = {a: 0.0 for a in A}
    tot_pos = {a: sum(p[(a, b)] for b in B) > 0 for a in A}
    for _ in range(CH_K):
        h = {
            a: (1.0 + sum(p[(a, b)] * h[b] for b in trans))
            if tot_pos[a]
            else 0.0
            for a in A
        }
    got = {r.state: r.h_steps for r in q_hitting_time(spark, SF).collect()}
    for a in A:
        assert math.isclose(got[a], h[a], rel_tol=1e-6, abs_tol=1e-8), a
    for a in A:
        if tot_pos[a]:
            assert got[a] >= 1.0


def test_journey_entropy_matches_python(spark):
    from ocr_to_csv_spark.functions.chainops import CH_K, q_journey_entropy

    p, A, B = _counts()
    trans = [a for a in A if a != "START"]
    H = {
        a: sum(
            -p[(a, b)] * math.log(p[(a, b)]) if p[(a, b)] > 0 else 0.0
            for b in B
        )
        for a in A
    }
    e = {a: 0.0 for a in A}
    for _ in range(CH_K):
        e = {a: H[a] + sum(p[(a, b)] * e[b] for b in trans) for a in A}
    got = {
        r.state: (r.step_entropy, r.journey_nats)
        for r in q_journey_entropy(spark, SF).collect()
    }
    for a in A:
        assert math.isclose(got[a][0], H[a], rel_tol=1e-6, abs_tol=1e-8), a
        assert math.isclose(got[a][1], e[a], rel_tol=1e-6, abs_tol=1e-8), a
        # expected journey surprisal is at least the first step's entropy
        assert got[a][1] >= got[a][0] - 1e-9
