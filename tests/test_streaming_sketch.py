"""Stateful streaming count-min sketch: cells accumulated across
micro-batches must equal the batch sketch over the same rows, and the
count-min guarantee (never undercount) must hold for probe tokens."""

import os

from pyspark.sql import functions as F

from ocr_to_csv_spark.functions.textops import CM_PROBES, CM_ROWS, _cm_col
from ocr_to_csv_spark.functions.util import tokens

SF = "/root/testdata/sf0.001"


def _batch_cells(docs):
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    cells = None
    for r in range(CM_ROWS):
        part = toks.select(
            F.lit(r).alias("r"), _cm_col(F.col("tok"), r).cast("int").alias("c")
        )
        cells = part if cells is None else cells.unionByName(part)
    return {
        (row["r"], row["c"]): row["cnt"]
        for row in cells.groupBy("r", "c").agg(F.count("*").alias("cnt")).collect()
    }


def test_stream_sketch_equals_batch_sketch(spark, tmp_path):
    from ocr_to_csv_spark.streaming.sketch import stream_count_min

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    src = str(tmp_path / "stream")
    os.makedirs(src)
    # two micro-batches: cells touched by both must accumulate, not reset
    half = docs.where("doc_id % 2 = 0")
    other = docs.where("doc_id % 2 = 1")
    half.coalesce(1).write.mode("append").parquet(src)
    other.coalesce(1).write.mode("append").parquet(src)

    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    updates = stream_count_min(spark, src, schema, max_files_per_trigger=1)
    q = (
        updates.writeStream.format("memory")
        .queryName("cm_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.sql("SELECT * FROM cm_out").collect()
    assert emitted
    stream_cells: dict[tuple, int] = {}
    for row in emitted:  # monotone updates: final value = max
        k = (row["r"], row["c"])
        stream_cells[k] = max(stream_cells.get(k, 0), row["cnt"])

    assert stream_cells == _batch_cells(docs)
    # at least one cell was updated in both batches (accumulated state);
    # with a fresh-per-batch state that cell would equal the batch-2-only
    # count and the dict equality above would already have failed, but
    # assert the precondition so the test can't silently weaken
    both = set(_batch_cells(half)) & set(_batch_cells(other))
    assert both, "split must share sketch cells for the test to bite"

    # count-min guarantee on the probes: estimate >= exact count
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    exact = {
        r["tok"]: r["n"]
        for r in toks.where(F.col("tok").isin(CM_PROBES))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    probe_cells = {
        t: [
            (r, row["c"])
            for r in range(CM_ROWS)
            for row in spark.range(1)
            .select(_cm_col(F.lit(t), r).cast("int").alias("c"))
            .collect()
        ]
        for t in CM_PROBES
    }
    for t, rcs in probe_cells.items():
        est = min(stream_cells.get(rc, 0) for rc in rcs)
        assert est >= exact.get(t, 0), t


def test_stream_bitmap_equals_batch_bitmap(spark, tmp_path):
    """Stream-accumulated bitmap words must equal the batch bitmap over
    the same rows, cell for cell (OR is monotone: final = max ver rows
    == per-key OR of updates)."""
    from pyspark.sql import functions as F

    from ocr_to_csv_spark.streaming.sketch import BM_WORDS, stream_bitmap

    events = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "bm_stream")
    os.makedirs(src)
    events.where("event_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    events.where("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)

    schema = ("event_id bigint, ts timestamp, user_id bigint,"
              " event_type string, value double, props string")
    q = (
        stream_bitmap(spark, src, schema, max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("bm_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "bm_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {}
    for r in spark.sql("SELECT * FROM bm_out").collect():
        k = (r["event_type"], r["blk"], r["w"])
        got[k] = got.get(k, 0) | r["word"]

    batch = (
        events.select(
            "event_type",
            (F.col("user_id") / (BM_WORDS * 32)).cast("long").alias("blk"),
            ((F.col("user_id") % (BM_WORDS * 32)) / 32).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))").alias("m"),
        )
        .groupBy("event_type", "blk", "w")
        .agg(F.bit_or("m").alias("word"))
        .collect()
    )
    want = {(r["event_type"], r["blk"], r["w"]): r["word"] for r in batch}
    assert got == want
    # popcounts recover the exact per-type distinct-user counts
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    by_type = {}
    for (t, _, _), word in got.items():
        by_type[t] = by_type.get(t, 0) + bin(word & ((1 << 64) - 1)).count("1")
    assert by_type == exact
