"""Stateful streaming dedup: duplicates injected across separate files
(→ separate micro-batches) must be dropped exactly once, which requires
state that survives batches."""

import os

from pyspark.sql import functions as F


def test_cross_batch_dedup(spark, corpus_dir, tmp_path):
    from ocr_to_csv_spark.streaming.dedup import stream_dedup
    from ocr_to_csv_spark.streaming.stream import DOC_SCHEMA

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet").select(
        "doc_id",
        F.transform(
            "spans",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].cast("int").alias("offset"),
            ),
        ).alias("spans"),
    )
    n_docs = docs.count()

    src = str(tmp_path / "stream")
    os.makedirs(src)
    # batch 1: originals; batch 2: the same docs under new ids (dupes)
    docs.coalesce(1).write.mode("append").parquet(src)
    docs.withColumn("doc_id", F.concat(F.lit("dup-"), "doc_id")).coalesce(
        1
    ).write.mode("append").parquet(src)

    deduped = stream_dedup(spark, src, DOC_SCHEMA, max_files_per_trigger=1)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.sql("SELECT * FROM dedup_out").collect()
    assert len(out) == n_docs  # every duplicate dropped
    assert len({r["h"] for r in out}) == n_docs
    # state is sharded: many buckets in use
    assert len({r["bucket"] for r in out}) > 10
