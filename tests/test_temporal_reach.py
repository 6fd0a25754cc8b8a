"""Batch 36: time-respecting reachability must NOT traverse a contact
that happened before the walker arrived — a static path 0→1→2 whose
1→2 contact predates the 0→1 contact leaves 2 unreached."""

import datetime

from ocr_to_csv_spark.functions.temporal import q_temporal_reach

TS = datetime.datetime

SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint,"
    " event_type string, value double, props string"
)


def test_time_order_blocks_static_path(spark, tmp_path):
    t = [TS(2024, 1, 1, 0, 0, s) for s in range(5)]
    # contact sequence within one event_type: 1, 2, 0, 1
    # edges: (1->2, t1), (2->0, t2), (0->1, t3)
    rows = [
        (1, t[0], 1, "x", 0.0, "{}"),
        (2, t[1], 2, "x", 0.0, "{}"),
        (3, t[2], 0, "x", 0.0, "{}"),
        (4, t[3], 1, "x", 0.0, "{}"),
    ]
    spark.createDataFrame(rows, SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    got = {r["user_id"]: r["arrival"] for r in
           q_temporal_reach(spark, str(tmp_path)).collect()}
    # seed 0 (0 % 37 == 0) reaches 1 via the t3 contact; the only
    # contact INTO 2 happened at t1 < arrival(1), so 2 stays unreached.
    t3 = int(t[3].replace(tzinfo=datetime.timezone.utc).timestamp())
    assert got[0] == 0
    assert got[1] == t3
    assert 2 not in got
