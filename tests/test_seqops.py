"""Batch 95: 2-step sequential pattern support."""

import glob
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_seq_patterns_matches_python_mirror(spark):
    from ocr_to_csv_spark.functions.seqops import POS_SHIFT, q_seq_patterns

    files = sorted(glob.glob(f"{SF}/events.parquet")) or sorted(
        glob.glob(f"{SF}/events.parquet/*.parquet")
    )
    e = pd.concat(
        pd.read_parquet(f, columns=["user_id", "ts", "event_id", "event_type"])
        for f in files
    )
    e = e[e.user_id.notna()]
    per = {}
    for _, r in e.iterrows():
        pos = math.floor(r.ts.timestamp()) * POS_SHIFT + int(r.event_id)
        key = (int(r.user_id), r.event_type)
        lo, hi = per.get(key, (pos, pos))
        per[key] = (min(lo, pos), max(hi, pos))
    want = {}
    users = {u for u, _ in per}
    for (u, a), (amin, _) in per.items():
        for (u2, b), (_, bmax) in per.items():
            if u2 == u and a != b and amin < bmax:
                want[(a, b)] = want.get((a, b), 0) + 1
    got = {
        (r.a, r.b): (r.support, r.n_users)
        for r in q_seq_patterns(spark, SF).collect()
    }
    assert {k: v[0] for k, v in got.items()} == want
    assert all(v[1] == len(users) for v in got.values())


def test_seq_patterns_is_order_aware(spark, tmp_path):
    """Crafted corpus where 'signup then purchase' holds but the
    reverse doesn't: the earliest-a < latest-b precedence must yield
    asymmetric supports (min<max is symmetric only when journeys
    overlap both ways, which sf0.001's dense streams always do)."""
    from ocr_to_csv_spark.functions.seqops import q_seq_patterns

    rows = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 01:00",
                 "2024-01-02 00:00", "2024-01-02 01:00"]
            ).astype("datetime64[us]"),
            "user_id": [1, 1, 2, 2],
            "event_type": ["signup", "purchase", "signup", "purchase"],
            "value": [0.0] * 4,
            "props": ["{}"] * 4,
        }
    )
    rows.to_parquet(tmp_path / "events.parquet")
    got = {
        (r.a, r.b): r.support
        for r in q_seq_patterns(spark, str(tmp_path)).collect()
    }
    assert got == {("signup", "purchase"): 2}
