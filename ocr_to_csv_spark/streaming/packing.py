"""Custom stateful streaming operator: training-sequence packing over a
document stream via ``applyInPandasWithState``.

The batch side (``curation5.q_pack_sequences``) computes each document's
offset in its shard's concatenated token stream with a window prefix
sum. On a stream the shard offset is STATE: one long per shard (the
token count emitted so far), keyed by ``source``. Each micro-batch
orders its slice of a shard by doc_id, assigns offsets continuing from
the stored watermark, and advances it — so a tokenizer fleet can pack
an unbounded ingest into fixed SEQ_LEN sequences without ever seeing
the corpus at once.

Token counting stays JVM-side (the same ``tokens`` expression as the
batch op); Python only runs the per-shard prefix sum over batch-sized
rows. State is one long per shard — constant, never doc-sized.

Stream order within a shard is ingest order (that is the definition of
packing a stream); when batches arrive in doc_id order the result is
row-for-row equal to the batch operator, which the test asserts.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from ..functions.curation5 import SEQ_LEN

PACK_OUT_SCHEMA = (
    "source string, doc_id long, n_tokens long, start_off long, "
    "seq_first long, seq_last long, n_seqs long"
)
PACK_STATE_SCHEMA = "off long"


def _pack_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state,
) -> Iterator[pd.DataFrame]:
    off = state.get[0] if state.exists else 0
    batch = pd.concat(list(pdfs), ignore_index=True).sort_values("doc_id")
    rows = []
    for doc_id, n in zip(batch["doc_id"], batch["n_tokens"]):
        n = int(n)
        start, end = off, off + n
        rows.append(
            (
                key[0],
                int(doc_id),
                n,
                start,
                start // SEQ_LEN,
                (end - 1) // SEQ_LEN,
                (end - 1) // SEQ_LEN - start // SEQ_LEN + 1,
            )
        )
        off = end
    state.update((off,))
    yield pd.DataFrame(
        rows,
        columns=[
            "source",
            "doc_id",
            "n_tokens",
            "start_off",
            "seq_first",
            "seq_last",
            "n_seqs",
        ],
    )


def stream_pack_sequences(
    spark,
    docs_stream_dir: str,
    doc_schema: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming DataFrame of per-document packing assignments: each
    document's offset in its source shard's token stream and the
    SEQ_LEN-grid sequence ids it occupies, with the shard offset
    carried across micro-batches as keyed state."""
    from pyspark.sql import functions as F

    from ..functions.util import tokens

    reader = spark.readStream.schema(doc_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(docs_stream_dir)
    scored = docs.select(
        "source",
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    return scored.groupBy("source").applyInPandasWithState(
        _pack_group,
        outputStructType=PACK_OUT_SCHEMA,
        stateStructType=PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
