"""Batch 15: hand-computed fixtures for the RANGE-frame window (incl.
same-second peers), exact OLS rationals, deterministic mode tie-break,
ordered string aggregation, and the Gini rank-weighted sums."""

import datetime

from ocr_to_csv_spark.functions.statsops import (
    q_gini,
    q_mode_per_group,
    q_ols_fit,
    q_range_window,
    q_string_agg_ordered,
)

TS = datetime.datetime

EV_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)


def _events(spark, tmp_path, rows):
    spark.createDataFrame(rows, EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_range_window_trailing_and_peers(spark, tmp_path):
    t0 = TS(2024, 1, 1, 0, 0, 0)

    def at(s):
        return t0 + datetime.timedelta(seconds=s)

    rows = [
        (1, at(0), 1, "a", 1.00, "{}"),
        (2, at(300), 1, "a", 2.00, "{}"),
        # same second as event 2 — RANGE peers aggregate together
        (3, at(300), 1, "a", 4.00, "{}"),
        # 601 s after event 1 → event 1 falls out of the frame
        (4, at(601), 1, "a", 8.00, "{}"),
        # other user: frames never cross users
        (5, at(300), 2, "a", 16.00, "{}"),
    ]
    sf = _events(spark, tmp_path, rows)
    got = {
        r["event_id"]: (r["trail_cents"], r["trail_n"])
        for r in q_range_window(spark, sf).collect()
    }
    assert got[1] == (100, 1)
    # events 2 and 3 are peers at sec=300: both see 100+200+400
    assert got[2] == (700, 3)
    assert got[3] == (700, 3)
    # at 601 s: frame [1, 601] excludes event 1, includes 2,3,4
    assert got[4] == (200 + 400 + 800, 3)
    assert got[5] == (1600, 1)


def test_ols_fit_exact_rationals(spark, tmp_path):
    # y = 200x + 100 cents exactly: x = hour, y = value*100
    rows = [
        (1, TS(2024, 1, 1, 0, 0, 0), 1, "lin", 1.00, "{}"),  # x=0 y=100
        (2, TS(2024, 1, 1, 1, 0, 0), 1, "lin", 3.00, "{}"),  # x=1 y=300
        (3, TS(2024, 1, 1, 2, 0, 0), 1, "lin", 5.00, "{}"),  # x=2 y=500
    ]
    sf = _events(spark, tmp_path, rows)
    r = q_ols_fit(spark, sf).collect()[0]
    assert r["n"] == 3
    # slope = num/den must equal 200, intercept = i_num/i_den = 100
    assert r["slope_num"] == 200 * r["slope_den"] and r["slope_den"] > 0
    assert r["icept_num"] == 100 * r["icept_den"] and r["icept_den"] > 0


def test_mode_tie_breaks_to_smallest_k(spark, tmp_path):
    rows = [
        (1, TS(2024, 1, 1), 1, "t", 1.0, '{"k": 7}'),
        (2, TS(2024, 1, 1), 1, "t", 1.0, '{"k": 7}'),
        (3, TS(2024, 1, 1), 1, "t", 1.0, '{"k": 3}'),
        (4, TS(2024, 1, 1), 1, "t", 1.0, '{"k": 3}'),  # tie 2-2 → k=3 wins
        (5, TS(2024, 1, 1), 1, "t", 1.0, '{"k": 9}'),
        (6, TS(2024, 1, 1), 1, "u", 1.0, "{}"),  # no k at all → no row
    ]
    sf = _events(spark, tmp_path, rows)
    rows_out = q_mode_per_group(spark, sf).collect()
    assert len(rows_out) == 1
    r = rows_out[0]
    assert (r["event_type"], r["mode_k"], r["cnt"]) == ("t", 3, 2)


def test_string_agg_ordered_sorted_distinct(spark, tmp_path):
    rows = [
        (1, TS(2024, 1, 1), 1, "view", 1.0, "{}"),
        (2, TS(2024, 1, 1), 1, "buy", 1.0, "{}"),
        (3, TS(2024, 1, 1), 1, "view", 1.0, "{}"),  # dup collapses
        (4, TS(2024, 1, 1), 2, "buy", 1.0, "{}"),
    ]
    sf = _events(spark, tmp_path, rows)
    got = {
        r["user_id"]: (r["types_csv"], r["n_types"])
        for r in q_string_agg_ordered(spark, sf).collect()
    }
    assert got[1] == ("buy,view", 2)
    assert got[2] == ("buy", 1)


def test_gini_rank_weighted_sums(spark, tmp_path):
    # amounts 100, 200, 300 → n=3, sum=600, W = 1*100+2*200+3*300 = 1400
    rows = [
        (1, TS(2024, 1, 1), 1, "g", 3.00, "{}"),
        (2, TS(2024, 1, 1), 1, "g", 1.00, "{}"),
        (3, TS(2024, 1, 1), 1, "g", 2.00, "{}"),
        (4, TS(2024, 1, 1), 1, "g", 0.00, "{}"),  # zero excluded
    ]
    sf = _events(spark, tmp_path, rows)
    r = q_gini(spark, sf).collect()[0]
    assert (r["n"], r["sum_c"], r["wsum"]) == (3, 600, 1400)
    # perfectly equal amounts → Gini 0 via the formula
    g = 2 * r["wsum"] / (r["n"] * r["sum_c"]) - (r["n"] + 1) / r["n"]
    assert abs(g - (2 * 1400 / 1800 - 4 / 3)) < 1e-12
