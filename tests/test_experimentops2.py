"""Batch 91: SPRT early stopping + runs test."""

import glob
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _daily():
    files = sorted(glob.glob(f"{SF}/events.parquet")) or sorted(
        glob.glob(f"{SF}/events.parquet/*.parquet")
    )
    e = pd.concat(
        pd.read_parquet(f, columns=["user_id", "ts", "event_type"])
        for f in files
    )
    e = e[e.user_id.notna()]
    e["arm"] = e.user_id.astype(int) % 2
    e["day"] = e.ts.map(lambda t: math.floor(t.timestamp() / 86400))
    e["succ"] = (e.event_type == "purchase").astype(int)
    return (
        e.groupby(["arm", "day"])
        .agg(n=("succ", "size"), k=("succ", "sum"))
        .reset_index()
    )


def test_sprt_matches_python_mirror(spark):
    from ocr_to_csv_spark.functions.experimentops2 import (
        A_BOUND,
        B_BOUND,
        L0,
        L1,
        q_sprt_decision,
    )

    d = _daily()
    want = {}
    for arm, grp in d.groupby("arm"):
        llr = 0
        decided, decision, dday = 0, 0, -1
        for _, r in grp.sort_values("day").iterrows():
            if decided:
                break
            llr += int(r.k) * L1 + (int(r.n) - int(r.k)) * L0
            if llr >= A_BOUND:
                decided, decision, dday = 1, 1, int(r.day)
            elif llr <= B_BOUND:
                decided, decision, dday = 1, 2, int(r.day)
        want[arm] = (len(grp), decided, decision, dday, llr)
    got = {
        r.arm: (r.n_days, r.decided, r.decision, r.decision_day, r.final_llr)
        for r in q_sprt_decision(spark, SF).collect()
    }
    assert got == want


def test_sprt_planted_streams():
    """Model sanity: a hot stream crosses A fast; a cold one crosses B."""
    from ocr_to_csv_spark.functions.experimentops2 import (
        A_BOUND,
        B_BOUND,
        L0,
        L1,
    )

    llr = 0
    hot_days = 0
    while llr < A_BOUND:  # 40% conversion days of 10 trials
        llr += 4 * L1 + 6 * L0
        hot_days += 1
    assert hot_days <= 6
    llr = 0
    cold_days = 0
    while llr > B_BOUND:  # 5% conversion days
        llr += 0 * L1 + 10 * L0  # wait: 5% of 10 ≈ 0.5 — use 0/10 days
        cold_days += 1
    assert cold_days <= 6


def test_runs_test_matches_python_mirror(spark):
    from ocr_to_csv_spark.functions.experimentops2 import q_runs_test

    d = _daily()
    want = {}
    for arm, grp in d.groupby("arm"):
        signs = [
            1 if 5 * int(r.k) >= int(r.n) else 0
            for _, r in grp.sort_values("day").iterrows()
        ]
        runs = 1 + sum(a != b for a, b in zip(signs, signs[1:]))
        n1 = sum(signs)
        n2 = len(signs) - n1
        want[arm] = (len(signs), runs, n1, n2, n1 + n2 + 2 * n1 * n2, n1 + n2)
    got = {
        r.arm: (r.n_days, r.r_runs, r.n1, r.n2, r.er_num, r.er_den)
        for r in q_runs_test(spark, SF).collect()
    }
    assert got == want
