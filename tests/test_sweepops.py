"""Batch 50: hand-computed sweep-line fixtures — pairwise overlap,
triple overlap counted once, and per-day peak concurrency with the
earliest attainment second."""

import datetime

from ocr_to_csv_spark.functions.sweepops import (
    q_interval_overlap,
    q_peak_concurrency,
)

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)
BASE = datetime.datetime(2024, 1, 1)
BASE_EPOCH = int(BASE.replace(tzinfo=datetime.timezone.utc).timestamp())


def _ev(i, user, start_s, dur_s):
    return (i, BASE + datetime.timedelta(seconds=start_s), user,
            "view", float(dur_s), "")


def test_sweep_hand_computed(spark, tmp_path):
    rows = [
        # user 1: [0,10) [5,12) [20,25) → pairwise overlap [5,10) = 5 s
        _ev(1, 1, 0, 10), _ev(2, 1, 5, 7), _ev(3, 1, 20, 5),
        # user 2: [0,10) [2,8) [4,6) → covered ≥2 over [2,8) = 6 s
        _ev(4, 2, 0, 10), _ev(5, 2, 2, 6), _ev(6, 2, 4, 2),
        # user 3: disjoint [0,5) [5,10) (half-open: no overlap at t=5)
        _ev(7, 3, 0, 5), _ev(8, 3, 5, 5),
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r["user_id"]: r["overlap_s"]
        for r in q_interval_overlap(spark, str(tmp_path)).collect()
    }
    assert got == {1: 5, 2: 6, 3: 0}

    peaks = {
        r["day"]: (r["peak"], r["first_peak_s"])
        for r in q_peak_concurrency(spark, str(tmp_path)).collect()
    }
    # sweep by hand: cov 3 at t=0 (three starts), 4 at t=2, 5 at t=4;
    # at t=5 the end of [0,5) processes BEFORE the two starts
    # (half-open tie-break) → 4, then +2 → peak 6, first reached at t=5
    assert peaks == {"2024-01-01": (6, BASE_EPOCH + 5)}
