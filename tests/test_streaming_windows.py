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


def test_session_stream_matches_batch(spark, tmp_path):
    from ocr_to_csv_spark.streaming.windows import (
        batch_session_counts,
        drain_to_memory,
        session_event_counts,
    )

    src = str(tmp_path / "sess_stream")
    (tmp_path / "sess_stream").mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet",
        src + "/part-00000.parquet",
    )

    stream_df = session_event_counts(spark, src)
    drain_to_memory(stream_df, "sess_counts", str(tmp_path / "sess_ckpt"))

    got = {
        (str(r["sess_start"]), str(r["sess_end"]), r["user_id"], r["n_events"], r["total"])
        for r in spark.sql("SELECT * FROM sess_counts").collect()
    }
    exp = {
        (str(r["sess_start"]), str(r["sess_end"]), r["user_id"], r["n_events"], r["total"])
        for r in batch_session_counts(spark, src).collect()
    }
    assert got == exp and len(got) > 0
    # sessions genuinely merge events: some session holds more than one
    assert any(n > 1 for (_, _, _, n, _) in got)
