"""Streaming ingest edge: WARC record stream equals the batch parse
across micro-batches; JSONL foreachBatch split lands typed rows and
quarantine lines incrementally and exactly."""

import os

import pandas as pd

from ocr_to_csv_spark.sources.warc import synth_warc, warc_records
from ocr_to_csv_spark.streaming.ingest import (
    stream_ingest_jsonl,
    stream_warc_records,
)


def test_stream_warc_equals_batch(spark, tmp_path):
    src = str(tmp_path / "blobs")
    os.makedirs(src)
    # two files → two micro-batches with maxFilesPerTrigger=1
    for part, seeds in enumerate(((0, 1), (2,))):
        pd.DataFrame([
            {"warc_ref": f"warc-{s}", "content": synth_warc(
                s, n_pages=4, gzip_members=bool(s % 2))[0]}
            for s in seeds
        ]).to_parquet(f"{src}/part{part}.parquet", index=False)

    recs = stream_warc_records(spark, src, max_files_per_trigger=1)
    q = (
        recs.writeStream.format("memory").queryName("warc_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT * FROM warc_stream_out ORDER BY warc_ref, rec_idx"
    ).collect()

    batch = warc_records(
        spark.read.parquet(src)
    ).orderBy("warc_ref", "rec_idx").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in batch]
    assert len(got) == 3 * 6  # warcinfo + request + 4 pages per blob


def test_stream_ingest_jsonl_split(spark, tmp_path):
    src = tmp_path / "jl"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "a"}\n{"doc_id": 2, "text": "b"}\n'
    )
    (src / "b.jsonl").write_text(
        '{"doc_id": 3, "text": "c"}\n{nope\n'
    )
    good_out = str(tmp_path / "good")
    quar_out = str(tmp_path / "quar")
    stream_ingest_jsonl(
        spark, str(src), "doc_id bigint, text string",
        good_out, quar_out, str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    good = spark.read.parquet(good_out)
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2, 3]
    quar = spark.read.parquet(quar_out)
    assert [r["raw_line"] for r in quar.collect()] == ["{nope"]
