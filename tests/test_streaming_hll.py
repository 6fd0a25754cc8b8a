"""Stateful streaming HyperLogLog: registers accumulated across
micro-batches must equal the batch sketch's registers over the same
rows (register-for-register), and registers must be monotone."""

import os

from pyspark.sql import functions as F

from ocr_to_csv_spark.functions.relational import HLL_M
from ocr_to_csv_spark.functions.util import hex32

SF = "/root/testdata/sf0.001"

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)


def _batch_registers(events):
    h = hex32(F.concat(F.lit("hll|"), F.col("user_id").cast("string")))
    hashed = events.select(
        "event_type",
        (h % HLL_M).alias("bucket"),
        F.floor(h / HLL_M).cast("long").alias("w"),
    ).select(
        "event_type",
        "bucket",
        F.when(F.col("w") == 0, F.lit(27))
        .otherwise(F.lit(27) - F.length(F.conv(F.col("w"), 10, 2)))
        .cast("int")
        .alias("rho"),
    )
    return {
        (r["event_type"], r["bucket"]): r["m"]
        for r in hashed.groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m"))
        .collect()
    }


def test_stream_hll_equals_batch_registers(spark, tmp_path):
    from ocr_to_csv_spark.streaming.sketch import stream_hll

    events = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "stream")
    os.makedirs(src)
    first = events.where("event_id % 2 = 0")
    second = events.where("event_id % 2 = 1")
    first.coalesce(1).write.mode("append").parquet(src)
    second.coalesce(1).write.mode("append").parquet(src)

    updates = stream_hll(spark, src, EVENT_SCHEMA, max_files_per_trigger=1)
    q = (
        updates.writeStream.format("memory")
        .queryName("hll_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.sql("SELECT * FROM hll_out").collect()
    assert emitted
    stream_regs: dict[tuple, int] = {}
    for row in emitted:  # monotone registers: final value = max
        k = (row["event_type"], row["bucket"])
        stream_regs[k] = max(stream_regs.get(k, 0), row["rho"])

    assert stream_regs == _batch_registers(events)
    # precondition for the accumulation to bite: some register is
    # touched by both halves
    both = set(_batch_registers(first)) & set(_batch_registers(second))
    assert both, "halves must share registers for the test to bite"
    # constant-state bound: at most HLL_M registers per event_type
    per_type: dict[str, int] = {}
    for et, _b in stream_regs:
        per_type[et] = per_type.get(et, 0) + 1
    assert all(n <= HLL_M for n in per_type.values())
