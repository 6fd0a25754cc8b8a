"""Stateful streaming sequence packing: shard offsets must carry across
micro-batches, and a doc_id-ordered stream must reproduce the batch
packing operator row for row."""

import os

from ocr_to_csv_spark.functions import curation5

SF = "/root/testdata/sf0.001"


def test_stream_packing_matches_batch(spark, tmp_path):
    from ocr_to_csv_spark.streaming.packing import stream_pack_sequences

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cut = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    src = str(tmp_path / "stream")
    os.makedirs(src)
    # two micro-batches in doc_id order: every shard's offset watermark
    # must survive the batch boundary or batch-2 offsets restart at 0
    docs.where(f"doc_id <= {cut}").coalesce(1).write.mode("append").parquet(src)
    docs.where(f"doc_id > {cut}").coalesce(1).write.mode("append").parquet(src)

    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    packed = stream_pack_sequences(spark, src, schema, max_files_per_trigger=1)
    q = (
        packed.writeStream.format("memory")
        .queryName("pack_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {tuple(r) for r in spark.sql("SELECT * FROM pack_out").collect()}
    expect = {
        tuple(r) for r in curation5.q_pack_sequences(spark, SF).collect()
    }
    assert got == expect
    # the second batch genuinely continued from state: some batch-2 doc
    # has a nonzero start_off in every multi-batch shard
    by_src: dict[str, list] = {}
    for r in got:
        by_src.setdefault(r[0], []).append(r)
    crossed = [
        s
        for s, rs in by_src.items()
        if any(r[1] > cut and r[3] > 0 for r in rs)
        and any(r[1] <= cut for r in rs)
    ]
    assert crossed, "no shard spanned both micro-batches; test is vacuous"
