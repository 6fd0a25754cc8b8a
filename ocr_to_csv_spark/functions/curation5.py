"""Training-data curation operators, batch 5: cross-document repeated-line
removal (RefinedWeb-style boilerplate stripping) and fixed-length training
sequence packing.

Scale design (100 TB):
- ``line_dedup`` is the line-level exact-dedup filter of RefinedWeb /
  Falcon (Penedo et al. 2023): a line whose exact text recurs across
  many distinct documents is boilerplate (navigation, cookie banners,
  footers) and is stripped from every document that carries it. The
  corpus here has no newlines, so a "line" is a fixed window of
  ``LINE_TOKENS`` consecutive whitespace tokens — same mechanics, same
  plan shape. Two shuffles, both scale-safe: (1) a line-keyed
  count-distinct-docs aggregate (partial aggregation map-side; the
  distinct set per line is doc-id-sized only for boilerplate lines,
  which is exactly the small set we keep); (2) a doc_id-keyed
  reassembly. The boilerplate set itself (df >= ``MIN_LINE_DF``) is
  orders of magnitude smaller than the line stream — Zipf head — so it
  is broadcast back and the membership test never reshuffles the lines.
- ``pack_sequences`` is GPT-style pretraining packing: documents are
  concatenated in a deterministic order into one token stream per
  shard and cut into fixed ``SEQ_LEN``-token training sequences; the
  operator computes, per document, its [start, end) offset in the
  shard stream and the range of sequence ids it lands in. The running
  offset is a window sum partitioned by shard (here ``source``; at
  real scale add ``pmod(hash(doc_id), K)`` as a second shard key so no
  single sort exceeds a partition) — each shard's prefix sum is an
  independent in-partition sort, never a global one, which is exactly
  how packing shards are produced for a 1000-executor tokenizer run.

Both are pure JVM-side expressions (no Python), integer-exact, with
DuckDB oracles running identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import DUCK_TOKENS, table, tokens

LINE_TOKENS = 8  # tokens per synthetic "line" (corpus has no newlines)
MIN_LINE_DF = 3  # a line in >= this many distinct docs is boilerplate
SEQ_LEN = 128  # tokens per packed training sequence


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style repeated-line removal: lines occurring in >=
    MIN_LINE_DF distinct documents are boilerplate; every document is
    re-emitted with those lines stripped. Output per doc: line counts
    before/after and the cleaned text. The boilerplate set is the Zipf
    head (tiny) and is broadcast; the line stream is never reshuffled
    for the membership test."""
    d = table(spark, sf_dir, "documents", spread=True)
    toks = tokens(F.col("text"))
    sz = F.size(toks)
    lines = d.where(sz > 0).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), ((sz - 1) / F.lit(LINE_TOKENS)).cast("int")),
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i * LINE_TOKENS + 1, LINE_TOKENS)
                ),
            )
        ).alias("line_no", "line"),
    )
    boiler = (
        lines.groupBy("line")
        .agg(F.count_distinct("doc_id").alias("df"))
        .where(F.col("df") >= MIN_LINE_DF)
        .select("line", F.lit(True).alias("is_bp"))
    )
    flagged = lines.join(F.broadcast(boiler), "line", "left").select(
        "doc_id",
        "line_no",
        "line",
        F.coalesce("is_bp", F.lit(False)).alias("is_bp"),
    )
    kept = F.array_sort(
        F.collect_list(
            F.when(~F.col("is_bp"), F.struct("line_no", "line"))
        )
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("is_bp").cast("long")).alias("n_removed"),
            F.array_join(
                F.transform(kept, lambda s: s["line"]), " "
            ).alias("clean_text"),
        )
        .select("doc_id", "n_lines", "n_removed", "clean_text")
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training sequence packing: concatenate each source shard's
    documents in doc_id order into one token stream and cut it into
    SEQ_LEN-token sequences. Per document: its token count, byte-free
    [start_off, start_off+n_tokens) offset in the shard stream, and the
    first/last sequence id it occupies. One in-partition window sum per
    shard; no global sort."""
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(tokens(F.col("text")))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = d.select(
        "source", "doc_id", n_tok.cast("long").alias("n_tokens")
    ).where(F.col("n_tokens") > 0)
    packed = scored.withColumn("end_off", F.sum("n_tokens").over(w)).select(
        "source",
        "doc_id",
        "n_tokens",
        (F.col("end_off") - F.col("n_tokens")).alias("start_off"),
        F.expr(f"(end_off - n_tokens) div {SEQ_LEN}").alias("seq_first"),
        F.expr(f"(end_off - 1) div {SEQ_LEN}").alias("seq_last"),
    )
    return packed.withColumn(
        "n_seqs", F.col("seq_last") - F.col("seq_first") + 1
    )


QUERIES = {
    "line_dedup": q_line_dedup,
    "pack_sequences": q_pack_sequences,
}

_TOKS = DUCK_TOKENS.format(x="text")

ORACLES = {}

ORACLES["line_dedup"] = f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
        WHERE len({_TOKS}) > 0
    ),
    lines AS (
        SELECT doc_id, i AS line_no,
               array_to_string(
                   toks[(i * {LINE_TOKENS} + 1):(i * {LINE_TOKENS} + {LINE_TOKENS})],
                   ' ') AS line
        FROM (
            SELECT doc_id, toks,
                   unnest(generate_series(0, (len(toks) - 1) // {LINE_TOKENS})) AS i
            FROM t
        )
    ),
    boiler AS (
        SELECT line FROM lines
        GROUP BY line HAVING count(DISTINCT doc_id) >= {MIN_LINE_DF}
    ),
    flagged AS (
        SELECT l.doc_id, l.line_no, l.line,
               (b.line IS NOT NULL) AS is_bp
        FROM lines l LEFT JOIN boiler b ON l.line = b.line
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_lines,
           sum(CASE WHEN is_bp THEN 1 ELSE 0 END)::BIGINT AS n_removed,
           coalesce(
               string_agg(CASE WHEN NOT is_bp THEN line END, ' '
                          ORDER BY line_no),
               '') AS clean_text
    FROM flagged
    GROUP BY doc_id
"""

ORACLES["pack_sequences"] = f"""
    WITH s AS (
        SELECT source, doc_id, len({_TOKS})::BIGINT AS n_tokens
        FROM documents
        WHERE len({_TOKS}) > 0
    ),
    o AS (
        SELECT source, doc_id, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS end_off
        FROM s
    )
    SELECT source, doc_id, n_tokens,
           (end_off - n_tokens)::BIGINT AS start_off,
           ((end_off - n_tokens) // {SEQ_LEN})::BIGINT AS seq_first,
           ((end_off - 1) // {SEQ_LEN})::BIGINT AS seq_last,
           ((end_off - 1) // {SEQ_LEN} - (end_off - n_tokens) // {SEQ_LEN}
            + 1)::BIGINT AS n_seqs
    FROM o
"""
