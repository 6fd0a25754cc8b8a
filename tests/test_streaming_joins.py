"""Stream-stream time-interval join equals the batch pairs on the same
data (the streaming twin of relational.q_interval_join)."""

import shutil


def test_interval_stream_join_matches_batch(spark, tmp_path):
    from ocr_to_csv_spark.streaming.joins import (
        batch_interval_pairs,
        drain_append_to_memory,
        interval_click_join,
    )

    src = str(tmp_path / "events_stream")
    (tmp_path / "events_stream").mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet",
        src + "/part-00000.parquet",
    )

    stream_df = interval_click_join(spark, src)
    drain_append_to_memory(stream_df, "ivl_pairs", str(tmp_path / "ckpt"))

    got = {
        (r["ivl_id"], r["click_id"], r["cents"])
        for r in spark.sql("SELECT * FROM ivl_pairs").collect()
    }
    exp = {
        (r["ivl_id"], r["click_id"], r["cents"])
        for r in batch_interval_pairs(spark, src).collect()
    }
    assert got == exp and len(got) > 0
