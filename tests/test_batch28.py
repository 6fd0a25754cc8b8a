"""Batch 28: hand-computed fixtures — linear interpolation across gaps
(including endpoint carry) and checksum-diff statuses."""

import datetime

from pyspark.sql import functions as F

from ocr_to_csv_spark.functions.dataops import TD_DROP, TD_MUT, q_table_diff
from ocr_to_csv_spark.functions.temporal import GAP_SCALE, q_gap_fill

TS = datetime.datetime


def test_gap_fill_linear_interpolation(spark, tmp_path):
    # user 1: day 0 val 10.00, day 3 val 40.00 -> days 1,2 interpolate
    rows = [
        (1, TS(1995, 1, 1), 1, "click", 10.0, "{}"),
        (2, TS(1995, 1, 4), 1, "click", 40.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {r["day"]: (r["val_milli"], r["was_gap"])
           for r in q_gap_fill(spark, str(tmp_path)).collect()}
    S = GAP_SCALE
    assert got[0] == (1000 * S, 0)       # 10.00 in cents*milli
    assert got[3] == (4000 * S, 0)
    assert got[1] == (1000 * S + (3000 * S * 1) // 3, 1)  # 20.00
    assert got[2] == (1000 * S + (3000 * S * 2) // 3, 1)  # 30.00


def test_table_diff_statuses(spark, tmp_path):
    # doc_ids chosen to hit each residue class exactly once
    changed = TD_MUT + 3      # % 97 == 3 -> text perturbed in replica
    missing = TD_DROP + 7     # % 101 == 7 -> dropped from replica
    clean = 5
    docs = [
        (clean, "same text", "en", "s1", 9),
        (changed, "will change", "en", "s1", 11),
        (missing, "will vanish", "en", "s1", 11),
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r["status"] for r in q_table_diff(spark, str(tmp_path)).collect()}
    assert got == {changed: "changed", missing: "missing_in_replica"}
