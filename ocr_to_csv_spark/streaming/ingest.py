"""Streaming ingest edge: the WARC and JSONL quarantine readers lifted
to Structured Streaming — a crawl or corpus release lands segment by
segment and the records/quarantine tables grow incrementally instead
of being re-parsed from scratch.

Shapes (both stateless — the quarantine split has no cross-batch
state, so these are pure lift, the ``streaming/stream.py`` pattern):

- ``stream_warc_records``: Spark has NO streaming binaryFile source,
  so crawl blobs stage as a parquet stream of (warc_ref, content) —
  exactly what a landing-zone writer produces — and the SAME
  ``warc_records`` mapInPandas stage runs per micro-batch. Record
  parity with the batch parser is by construction (shared code) and
  asserted by test.
- ``stream_ingest_jsonl``: the PERMISSIVE corrupt-column split inside
  ``foreachBatch`` — each micro-batch appends its typed rows and its
  raw quarantine lines to two parquet tables. (The batch path's
  ``.cache()`` quirk does not arise: foreachBatch hands us a
  materialized batch DataFrame.)

Scale notes: per-trigger admission via maxFilesPerTrigger (a SOURCE
option); both sinks are append-only and idempotent under Spark's
checkpointed file-sink commit protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_to_csv_spark.sources.jsonl import CORRUPT_COL
from ocr_to_csv_spark.sources.warc import warc_records

WARC_BLOB_SCHEMA = "warc_ref string, content binary"


def stream_warc_records(
    spark: SparkSession,
    blob_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming DataFrame of parsed WARC records from a landing-zone
    parquet stream of (warc_ref, content) blobs."""
    reader = spark.readStream.schema(WARC_BLOB_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return warc_records(reader.parquet(blob_dir))


def stream_ingest_jsonl(
    spark: SparkSession,
    jsonl_dir: str,
    schema: str,
    good_out: str,
    quarantine_out: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Incremental JSONL ingest: per micro-batch, append typed rows to
    ``good_out`` and raw malformed lines to ``quarantine_out``. Runs
    with trigger=availableNow (drain-and-stop; re-invoke per arrival
    or switch the trigger for continuous tailing)."""
    reader = (
        spark.readStream.schema(f"{schema}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(jsonl_dir)

    def _split(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            batch.filter(F.col(CORRUPT_COL).isNull()).drop(
                CORRUPT_COL
            ).write.mode("append").parquet(good_out)
            batch.filter(F.col(CORRUPT_COL).isNotNull()).select(
                F.col(CORRUPT_COL).alias("raw_line")
            ).write.mode("append").parquet(quarantine_out)
        finally:
            batch.unpersist()

    q = (
        stream.writeStream.foreachBatch(_split)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
