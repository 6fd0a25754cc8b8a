"""Batch 56: hand-computed Shapley attribution (incl. the efficiency
axiom and an untouched-purchaser mask-0 case) and the ALS half-step
against a numpy normal-equation mirror."""

import datetime

import numpy as np

from ocr_to_csv_spark.functions.gameops import (
    ALS_LAMBDA,
    CHANNELS,
    _factor,
    q_als_step,
    q_shapley_attribution,
)

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def _ev(i, user, etype, value=1.0):
    return (i, datetime.datetime(2024, 1, 2), user, etype, float(value), "")


def test_shapley_hand_computed(spark, tmp_path):
    rows = [
        _ev(1, 1, "click"), _ev(2, 1, "purchase"),
        _ev(3, 2, "click"), _ev(4, 2, "view"), _ev(5, 2, "purchase"),
        _ev(6, 3, "click"),            # no purchase → excluded
        _ev(7, 4, "purchase"),         # untouched purchaser: mask 0
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r["channel"]: r["phi24"]
        for r in q_shapley_attribution(spark, str(tmp_path)).collect()
    }
    assert got == {"click": 36, "view": 12, "signup": 0, "error": 0}
    # efficiency axiom: Σφ = v(all channels) − v(∅) = 3 − 1 = 2
    assert sum(got.values()) == 24 * 2


def test_als_step_matches_numpy(spark, tmp_path):
    rows = [
        _ev(1, 1, "click", 2.0), _ev(2, 1, "view", 3.0),
        _ev(3, 1, "click", 1.0),
        _ev(4, 2, "purchase", 5.0), _ev(5, 2, "error", 0.5),
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r["user_id"]: (r["det"], r["x1_num"], r["x2_num"])
        for r in q_als_step(spark, str(tmp_path)).collect()
    }
    ratings = {1: {"click": 300, "view": 300}, 2: {"purchase": 500,
                                                  "error": 50}}
    for user, rmap in ratings.items():
        Q = np.array([[_factor(t, 1), _factor(t, 2)] for t in rmap])
        r = np.array([rmap[t] for t in rmap])
        A = Q.T @ Q + ALS_LAMBDA * np.eye(2)
        b = Q.T @ r
        det = round(np.linalg.det(A))
        x_num = np.linalg.solve(A, b) * det
        assert got[user] == (int(det), round(x_num[0]), round(x_num[1]))
    # the exact solve really is the ridge solution
    assert all(v[0] > 0 for v in got.values())
