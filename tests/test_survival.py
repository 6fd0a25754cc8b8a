"""Batch 55: hand-computed Kaplan–Meier risk table (censoring at the
corpus horizon) and an exact-rational difference-in-differences."""

import datetime

from ocr_to_csv_spark.functions.survival import (
    q_diff_in_diff,
    q_kaplan_meier,
)

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)
BASE = datetime.datetime(2024, 1, 1)


def _ev(i, user, day, value=1.0):
    return (i, BASE + datetime.timedelta(days=day), user, "view",
            float(value), "")


def test_kaplan_meier_hand_computed(spark, tmp_path):
    rows = [
        _ev(1, 1, 0), _ev(2, 1, 10),   # t=10, last at horizon → censored
        _ev(3, 2, 0), _ev(4, 2, 2),    # t=2, churned (2 ≤ 10-3)
        _ev(5, 3, 1),                  # t=0, churned
        _ev(6, 4, 3), _ev(7, 4, 9),    # t=6, last day 9 > 7 → censored
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r["t_days"]: (r["n_risk"], r["d_churn"], r["c_censored"])
        for r in q_kaplan_meier(spark, str(tmp_path)).collect()
    }
    assert got == {
        0: (4, 1, 0), 2: (3, 1, 0), 6: (2, 0, 1), 10: (1, 0, 1),
    }


def test_diff_in_diff_hand_computed(spark, tmp_path):
    rows = [
        # user 1 (odd → control): pre 100+200, post 400 cents
        _ev(1, 1, 1, 1.0), _ev(2, 1, 2, 2.0), _ev(3, 1, 20, 4.0),
        # user 2 (even → treat): pre 100, post 500+300
        _ev(4, 2, 3, 1.0), _ev(5, 2, 21, 5.0), _ev(6, 2, 22, 3.0),
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    r = q_diff_in_diff(spark, str(tmp_path)).collect()[0]
    assert (r["s00"], r["s01"], r["s10"], r["s11"]) == (300, 400, 100, 800)
    assert (r["n00"], r["n01"], r["n10"], r["n11"]) == (2, 1, 1, 2)
    # did = (800/2 − 100/1) − (400/1 − 300/2) = 300 − 250 = 50 cents
    # = 50000 exact integer milli-cents (per-cell means are exact here)
    assert r["did_milli"] == 50_000
