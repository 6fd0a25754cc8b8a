"""Batch 52: hand-computed rolling-reach and new-vs-returning
fixtures."""

import datetime

from ocr_to_csv_spark.functions.windowdistinct import (
    q_new_vs_returning,
    q_sliding_distinct,
)

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def _ev(i, user, day):
    return (i, datetime.datetime(2024, 1, day, 12, 0), user, "view", 1.0, "")


def test_windowed_distinct_hand_computed(spark, tmp_path):
    rows = [
        _ev(1, 1, 1), _ev(2, 2, 1),          # day 1: users {1,2}
        _ev(3, 1, 1),                        # dup same day — deduped
        _ev(4, 1, 5),                        # day 5: {1}
        _ev(5, 3, 9), _ev(6, 1, 9),          # day 9: {3,1}
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    sf = str(tmp_path)
    got = {
        r["day"]: r["users_7d"]
        for r in q_sliding_distinct(spark, sf).collect()
    }
    # observed days: 1, 5, 9. Trailing 7d: d1←{1,2}=2; d5←d1,d5
    # ({1,2}∪{1})=2; d9←d5,d9 ({1}∪{3,1})=2 (d1 is 8 days before d9)
    assert got == {"2024-01-01": 2, "2024-01-05": 2, "2024-01-09": 2}

    nvr = {
        r["day"]: (r["new_users"], r["returning_users"])
        for r in q_new_vs_returning(spark, sf).collect()
    }
    assert nvr == {
        "2024-01-01": (2, 0),   # 1 and 2 first seen
        "2024-01-05": (0, 1),   # 1 returns
        "2024-01-09": (1, 1),   # 3 new, 1 returns
    }
