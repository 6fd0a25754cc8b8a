"""Custom stateful streaming operator: cross-batch NEAR-duplicate
detection via MinHash-LSH band state (``applyInPandasWithState``).

The batch dedup path (functions/dedup.py) equi-joins LSH band keys; a
streaming ingest instead needs to ask "does this document share a band
with anything seen in a PRIOR batch?" without re-scanning history. This
operator:

- computes the 8-permutation MinHash signature and its 2-row band keys
  MAP-SIDE inside a stateless ``mapInPandas`` (bit-identical to the
  batch DataFrame formulation — test-asserted), so the only stateful
  shuffle is the band-bucket groupBy;
- shards state by a band-key hash bucket; per bucket the state is the
  set of band keys already seen (keys only — never content);
- emits one row per (doc, band) with ``novel = key unseen before this
  batch``. Intra-batch collisions are NOT flagged (both copies emit
  novel=true): the verdict is deterministic under Spark's arbitrary
  intra-batch row order, and same-batch near-dups are exactly what the
  batch LSH join (q_lsh_pairs) already handles downstream.

A document is a cross-batch near-dup candidate iff any of its bands has
``novel = false`` — aggregate per doc_id in ``foreachBatch`` (rows of
one document always arrive in the same batch).
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterator, Tuple

import pandas as pd

from ..functions.dedup import MH_A, MH_B, MH_P, N_BANDS, N_SEEDS

N_BUCKETS = 64

BAND_SCHEMA = "doc_id string, band int, band_key string"
OUT_SCHEMA = "doc_id string, band int, band_key string, novel boolean"
STATE_SCHEMA = "seen array<string>"

_ROWS_PER_BAND = N_SEEDS // N_BANDS


def band_keys_py(text: str) -> list[tuple[int, str]]:
    """(band, band_key) pairs for one document — the pure-python twin of
    the batch DataFrame formulation in functions/dedup.py (same md5
    shingle hash, same affine permutations, same seed-ordered '|' join);
    parity is asserted by test_streaming_neardup.py. Docs with <3 tokens
    have no shingles and produce no bands (matching the batch explode)."""
    toks = [t for t in text.split() if t]
    if len(toks) < 3:
        return []
    mins = [None] * N_SEEDS
    for i in range(len(toks) - 2):
        sh = " ".join(toks[i : i + 3])
        h = int(hashlib.md5(sh.encode("utf-8")).hexdigest()[:8], 16) % MH_P
        for j in range(N_SEEDS):
            v = (h * MH_A[j] + MH_B[j]) % MH_P
            if mins[j] is None or v < mins[j]:
                mins[j] = v
    return [
        (
            b,
            "|".join(
                str(mins[b * _ROWS_PER_BAND + r]) for r in range(_ROWS_PER_BAND)
            ),
        )
        for b in range(N_BANDS)
    ]


def _band_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        out = {"doc_id": [], "band": [], "band_key": []}
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            for band, key in band_keys_py(text or ""):
                out["doc_id"].append(doc_id)
                out["band"].append(band)
                out["band_key"].append(key)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="object"),
                "band": pd.Series(out["band"], dtype="int64"),
                "band_key": pd.Series(out["band_key"], dtype="object"),
            }
        )


def _near_dup_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state,
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    batch_keys = set()
    out = {"doc_id": [], "band": [], "band_key": [], "novel": []}
    for pdf in pdfs:
        for doc_id, band, band_key in zip(
            pdf["doc_id"], pdf["band"], pdf["band_key"]
        ):
            k = f"{band}|{band_key}"
            out["doc_id"].append(doc_id)
            out["band"].append(int(band))
            out["band_key"].append(band_key)
            out["novel"].append(k not in seen)  # vs PRIOR batches only
            batch_keys.add(k)
    state.update((list(seen | batch_keys),))
    yield pd.DataFrame(
        {
            "doc_id": pd.Series(out["doc_id"], dtype="object"),
            "band": pd.Series(out["band"], dtype="int64"),
            "band_key": pd.Series(out["band_key"], dtype="object"),
            "novel": pd.Series(out["novel"], dtype="bool"),
        }
    )


def stream_near_dup(
    spark,
    docs_stream_dir: str,
    doc_schema: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming DataFrame (doc_id, band, band_key, novel): novel=false
    means the band key was seen in a prior micro-batch — a cross-batch
    near-dup candidate. ``max_files_per_trigger`` is a SOURCE option
    (admission control happens at the file source; setting it on the
    sink is silently ignored)."""
    from pyspark.sql import functions as F

    reader = spark.readStream.schema(doc_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(docs_stream_dir)
    bands = docs.select("doc_id", "text").mapInPandas(
        _band_batches, schema=BAND_SCHEMA
    )
    bucketed = bands.withColumn(
        "bucket",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat_ws("|", "band", "band_key")), 1, 4),
                16,
                10,
            ).cast("int"),
            F.lit(N_BUCKETS),
        ),
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        _near_dup_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
