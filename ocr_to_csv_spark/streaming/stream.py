"""Streaming extraction: ``readStream`` on the documents table →
``foreachBatch`` running the SAME batch stage functions → append sinks.

Every stage of the pipeline is a stateless per-document map (SURVEY.md
§1.3), so the batch plan lifts to Structured Streaming unchanged: each
micro-batch of documents goes through ``pipeline.extract`` and appends to
the span/row sinks. Exactly-once lands on Spark's streaming checkpoint +
idempotent parquet/Iceberg appends. Watermarks/session windows are not
required (no cross-document state in the extraction path; dedup/metrics
run as periodic batch passes over the sink tables).

``trigger(availableNow=True)`` drains the backlog and stops — the test
mode; a production run would use a processing-time trigger.
"""

from __future__ import annotations

import os

DOC_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def stream_extract(
    spark,
    docs_stream_dir: str,
    corpus_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain ``docs_stream_dir`` (directory of documents-parquet files)
    through the extraction pipeline into append-mode parquet sinks."""
    from ..extraction import pipeline

    tabs = pipeline.load_corpus(spark, corpus_dir)
    media, aliases = tabs["media"], tabs["aliases"]

    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(docs_stream_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        res = pipeline.extract(batch_df.sparkSession, batch_df, media, aliases)
        res["spans"].write.mode("append").parquet(os.path.join(out_dir, "extracted"))
        res["rows"].write.mode("append").parquet(os.path.join(out_dir, "rows"))

    q = (
        docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_upsert(
    spark,
    stream_dir: str,
    schema: str,
    catalog_base: str,
    name: str,
    checkpoint_dir: str,
    order_by: list[str] | None = None,
    max_files_per_trigger: int | None = None,
    keys: list[str] | None = None,
) -> None:
    """Streaming MERGE sink: each micro-batch upserts into a Catalog
    table. With ``keys`` set this is a true key-based MERGE
    (``merge_upsert``: a row re-arriving with CHANGED non-key values
    REPLACES the old row — Iceberg ``MERGE INTO ... WHEN MATCHED THEN
    UPDATE``); without keys it is insert-distinct (``merge_distinct``:
    idempotent for identical re-delivery only — changed values for the
    same logical key would coexist). Structured Streaming's foreachBatch
    is at-least-once — a crashed epoch can re-deliver a batch — so
    exactly-once table state comes from the sink being IDEMPOTENT in
    either mode. This is the parquet stand-in for Iceberg ``MERGE INTO``
    driven by a stream, and the pattern that keeps a continuously-
    ingested dedup/alias table correct at 10^12-doc scale."""
    from ..sources.catalog import Catalog

    cat = Catalog(spark, catalog_base)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(stream_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        if keys:
            cat.merge_upsert(batch_df, name, keys=keys)
        else:
            cat.merge_distinct(batch_df, name, order_by=order_by)

    q = (
        src.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_snapshot_append(
    spark,
    stream_dir: str,
    schema: str,
    catalog_base: str,
    name: str,
    checkpoint_dir: str,
    run_id: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Exactly-once streaming append onto a ``SnapshotCatalog`` table —
    the Iceberg streaming-sink commit protocol. ``foreachBatch`` is
    at-least-once (a crashed epoch re-delivers its batch, and a restart
    from a lost checkpoint restarts batch numbering at 0), so the sink
    records ``run_id:batch_id`` in each snapshot's summary and SKIPS
    commit keys it has already seen: re-delivery becomes a no-op at the
    metadata layer, with no reliance on data-level dedup. ``run_id``
    namespaces batch ids across logically distinct streams into the same
    table (Iceberg uses the streaming query id the same way); reusing a
    run_id asserts "same source, same partitioning of the input into
    batches" — which is exactly what a checkpoint-restore re-delivery
    is. The dedup scan reads O(snapshots) manifest JSON on the driver,
    never data."""
    from ..sources.snapshots import SnapshotCatalog

    cat = SnapshotCatalog(spark, catalog_base)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(stream_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        key = f"{run_id}:{batch_id}"
        if key in cat.committed_summaries(name, "commit_key"):
            return  # re-delivered epoch: already durable, skip
        cat.append(batch_df, name, summary={"commit_key": key})

    q = (
        src.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
