"""Custom stateful streaming operator: cross-batch exact deduplication
via ``applyInPandasWithState``.

A streaming ingest of a 10^12-doc corpus sees the same document again
hours later; dropping it needs state that outlives a micro-batch. The
operator hash-partitions documents by a content-hash bucket and keeps,
per bucket, the set of md5 digests already emitted — so state is sharded
across executors (no single-node set) and each group's state stays
small (digests only, never content).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

N_BUCKETS = 64

DEDUP_OUT_SCHEMA = "doc_id string, h string, bucket int"
STATE_SCHEMA = "seen array<string>"
IN_SCHEMA = "doc_id string, h string, bucket int"


def _dedup_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state,
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in pdfs:
        for doc_id, h, bucket in zip(pdf["doc_id"], pdf["h"], pdf["bucket"]):
            if h not in seen:
                seen.add(h)
                out.append((doc_id, h, int(bucket)))
    state.update((list(seen),))
    yield pd.DataFrame(out, columns=["doc_id", "h", "bucket"])


def stream_dedup(
    spark,
    docs_stream_dir: str,
    doc_schema: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming DataFrame of first-seen documents: (doc_id, h, bucket).

    Content hash = md5 of the concatenated span texts + media refs; the
    bucket column shards dedup state across the cluster.
    ``max_files_per_trigger`` is a SOURCE option (admission control —
    setting it on the sink is silently ignored by Spark).
    """
    from pyspark.sql import functions as F

    reader = spark.readStream.schema(doc_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(docs_stream_dir)
    hashed = docs.select(
        "doc_id",
        F.md5(
            F.encode(
                F.concat_ws(
                    "|",
                    F.transform(
                        "spans",
                        lambda s: F.concat_ws(
                            ":",
                            s["kind"],
                            F.coalesce(s["text"], F.lit("")),
                            F.coalesce(s["media_ref"], F.lit("")),
                        ),
                    ),
                ),
                "UTF-8",
            )
        ).alias("h"),
    ).withColumn("bucket", F.pmod(F.conv(F.substring("h", 1, 4), 16, 10).cast("int"), F.lit(N_BUCKETS)))
    return hashed.groupBy("bucket").applyInPandasWithState(
        _dedup_group,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
