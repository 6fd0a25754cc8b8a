"""Streaming windowed aggregation equals the batch plan on the same data."""

import shutil


def test_windowed_stream_matches_batch(spark, tmp_path):
    from ocr_to_csv_spark.streaming.windows import (
        batch_event_counts,
        drain_to_memory,
        windowed_event_counts,
    )

    src = str(tmp_path / "events_stream")
    (tmp_path / "events_stream").mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet",
        src + "/part-00000.parquet",
    )

    stream_df = windowed_event_counts(spark, src)
    drain_to_memory(stream_df, "win_counts", str(tmp_path / "ckpt"))

    got = {
        (str(r["win_start"]), r["event_type"], r["n"], r["total"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    exp = {
        (str(r["win_start"]), r["event_type"], r["n"], r["total"])
        for r in batch_event_counts(spark, src).collect()
    }
    assert got == exp and len(got) > 0
