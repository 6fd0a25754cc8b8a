"""Batch 16: hand-computed fixtures for lag-1 autocorrelation sums,
the CUSUM changepoint walk, inter-arrival gap stats, hourly chi²
(empty-bin algebra), and gaps-and-islands day streaks."""

import datetime

from ocr_to_csv_spark.functions.temporal import (
    q_active_streak,
    q_autocorr_daily,
    q_cusum_drift,
    q_interarrival,
    q_seasonality_hour,
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


def _day(d, n_events, start_id, user=1):
    return [
        (start_id + i, TS(2024, 1, d, 12, 0, i), user, "a", 1.0, "{}")
        for i in range(n_events)
    ]


def test_autocorr_daily_sums(spark, tmp_path):
    # daily counts: day1=1, day2=2, day3=3 → pairs (1,2),(2,3)
    rows = _day(1, 1, 0) + _day(2, 2, 10) + _day(3, 3, 20)
    sf = _events(spark, tmp_path, rows)
    r = q_autocorr_daily(spark, sf).collect()[0]
    assert r["n_pairs"] == 2
    assert (r["sx"], r["sy"]) == (1 + 2, 2 + 3)
    assert r["sxy"] == 1 * 2 + 2 * 3
    assert (r["sxx"], r["syy"]) == (1 + 4, 4 + 9)


def test_cusum_changepoint_at_level_shift(spark, tmp_path):
    # counts 1,1,1,5,5,5: walk of (6c - 18): -12,-24,-36,-24,-12,0
    # |walk| max at day 3 (index from 2024-01-03)
    rows = (
        _day(1, 1, 0) + _day(2, 1, 10) + _day(3, 1, 20)
        + _day(4, 5, 30) + _day(5, 5, 40) + _day(6, 5, 50)
    )
    sf = _events(spark, tmp_path, rows)
    r = q_cusum_drift(spark, sf).collect()[0]
    epoch = datetime.date(1970, 1, 1)
    assert r["cp_day_num"] == (datetime.date(2024, 1, 3) - epoch).days
    assert r["walk_at_cp"] == -36
    assert (r["n_days"], r["total"]) == (6, 18)


def test_interarrival_gaps(spark, tmp_path):
    t0 = TS(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 1, "a", 1.0, "{}"),
        (2, t0 + datetime.timedelta(seconds=10), 1, "a", 1.0, "{}"),
        (3, t0 + datetime.timedelta(seconds=40), 1, "a", 1.0, "{}"),
        (4, t0, 1, "b", 1.0, "{}"),  # single event → no gaps → no row
    ]
    sf = _events(spark, tmp_path, rows)
    got = {
        r["event_type"]: (r["n_gaps"], r["sum_gap"], r["sum_gap_sq"], r["max_gap"])
        for r in q_interarrival(spark, sf).collect()
    }
    assert got == {"a": (2, 40, 100 + 900, 30)}


def test_seasonality_chi2_empty_bin_algebra(spark, tmp_path):
    # 4 events all in hour 0: T=4, o=[4,0×23]
    # chi2_num = Σ(24o−T)² = (96−4)² + 23·16 = 8464 + 368 = 8832
    rows = [(i, TS(2024, 1, 1, 0, 0, i), 1, "a", 1.0, "{}") for i in range(4)]
    sf = _events(spark, tmp_path, rows)
    r = q_seasonality_hour(spark, sf).collect()[0]
    assert (r["total"], r["hours_seen"]) == (4, 1)
    assert r["chi2_num"] == 576 * 16 - 24 * 16  # == 8832
    assert r["chi2_num"] == 8832
    assert r["chi2_den"] == 96


def test_active_streak_islands(spark, tmp_path):
    # user 1 active days 1,2,3, 5,6, 9 → runs 3,2,1 → longest 3, n_runs 3
    days = [1, 2, 3, 5, 6, 9]
    rows = [
        (i, TS(2024, 1, d, 8, 0, 0), 1, "a", 1.0, "{}")
        for i, d in enumerate(days)
    ]
    # duplicate event same day must not split runs
    rows.append((99, TS(2024, 1, 2, 9, 0, 0), 1, "a", 1.0, "{}"))
    sf = _events(spark, tmp_path, rows)
    r = q_active_streak(spark, sf).collect()[0]
    assert (r["longest_streak"], r["n_runs"]) == (3, 3)
