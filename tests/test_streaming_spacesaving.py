"""Stateful streaming SpaceSaving: the cross-micro-batch heavy-hitter
tables must equal a reference SpaceSaving run over the same ordered
per-batch token multisets, and the SpaceSaving guarantees must hold —
cnt - err <= true <= cnt for tracked tokens, and every token hotter
than bucket_total/SS_M must be tracked."""

import hashlib
import os

from pyspark.sql import functions as F

from ocr_to_csv_spark.functions.util import tokens
from ocr_to_csv_spark.streaming.sketch import (
    SS_BUCKETS,
    SS_M,
    _ss_apply,
    stream_space_saving,
)

SF = "/root/testdata/sf0.001"
SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _hex32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _tok_counts(spark, docs):
    rows = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    return {r["tok"]: r["n"] for r in rows}


def _reference_tables(batches):
    """Python SpaceSaving twin: per bucket, apply each batch's token
    counts in sorted-token order."""
    tables: dict[int, dict] = {b: {} for b in range(SS_BUCKETS)}
    for counts in batches:
        per_bucket: dict[int, dict] = {}
        for tok, n in counts.items():
            per_bucket.setdefault(_hex32(tok) % SS_BUCKETS, {})[tok] = n
        for b, bc in per_bucket.items():
            for tok in sorted(bc):
                _ss_apply(tables[b], tok, bc[tok], SS_M)
    return tables


def test_stream_space_saving_matches_reference_and_guarantees(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    half = docs.where("doc_id % 2 = 0")
    other = docs.where("doc_id % 2 = 1")
    src = str(tmp_path / "stream")
    os.makedirs(src)
    half.coalesce(1).write.mode("append").parquet(src)
    other.coalesce(1).write.mode("append").parquet(src)

    updates = stream_space_saving(spark, src, SCHEMA, max_files_per_trigger=1)
    q = (
        updates.writeStream.format("memory")
        .queryName("ss_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.sql("SELECT * FROM ss_out").collect()
    assert emitted
    # final table per bucket = rows carrying that bucket's max version
    max_ver = {}
    for r in emitted:
        max_ver[r["bucket"]] = max(max_ver.get(r["bucket"], 0), r["ver"])
    got: dict[int, dict] = {}
    for r in emitted:
        if r["ver"] == max_ver[r["bucket"]]:
            got.setdefault(r["bucket"], {})[r["tok"]] = (r["cnt"], r["err"])

    # micro-batch order is file order (maxFilesPerTrigger=1, append order)
    ref = _reference_tables([_tok_counts(spark, half), _tok_counts(spark, other)])
    ref = {b: t for b, t in ref.items() if t}
    assert got == ref

    # SpaceSaving guarantees against exact counts
    exact = _tok_counts(spark, docs)
    bucket_total: dict[int, int] = {}
    for tok, n in exact.items():
        b = _hex32(tok) % SS_BUCKETS
        bucket_total[b] = bucket_total.get(b, 0) + n
    tracked = 0
    for b, table in got.items():
        for tok, (cnt, err) in table.items():
            true = exact[tok]
            assert cnt - err <= true <= cnt, (tok, cnt, err, true)
            tracked += 1
        for tok, n in exact.items():
            if _hex32(tok) % SS_BUCKETS == b and n * SS_M > bucket_total[b]:
                assert tok in table, f"hot token {tok} missing from bucket {b}"
    assert tracked  # sketch is non-trivial on this corpus
