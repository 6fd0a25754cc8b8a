"""Entropy coding, batch 160: Huffman expected code length by the
merge-sum identity and Elias-gamma postings-gap compression — the two
coding-theory classics that complete the compression family
(compress_ratio → bwt/mtf → here the actual bit budgets).

Scale design (100 TB):
- ``huffman_bits``: character frequencies are ONE keyed aggregate
  (alphabet-bounded); the Huffman construction never builds a tree —
  total encoded bits = Σ of all merge sums (each symbol's depth counts
  one bit per internal node above it), so the greedy is a bounded
  in-row fold over the sorted weight array: take the two smallest,
  re-insert their sum, accumulate it. EXACT int64 throughout; the
  Shannon bound H·N ≤ bits < (H+1)·N is pinned with H from
  nano-rounded log2 terms.
- ``elias_gamma_est``: per top-term posting list (the postings
  discipline), doc-id gaps encode in 2⌊log2 g⌋+1 bits — ⌊log2 g⌋
  computed as length(bin(g)) − 1, pure string/integer ops on both
  engines (no float log2 at power-of-two boundaries). Emits per-term
  gamma vs raw 32-bit budgets — the index-compression decision number.

Reference parity: no coding layer in the reference; extends
char_entropy, compress_ratio, dict_compress_est, postings_delta,
bwt_rle/mtf_encode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import DUCK_TOKENS, table, tokens

HUF_MAX_MERGES = 48  # alphabet guard (corpus chars ≤ ~40)
EG_TERMS = 16
NANO = 1_000_000_000


def q_huffman_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (module doc): (n_symbols, total_chars, huffman_bits,
    entropy_nano)."""
    d = table(spark, sf_dir, "documents", spread=True)
    ch = d.select(
        F.explode(F.split(F.col("text"), "")).alias("c")
    ).filter(F.col("c") != "")
    freqs = ch.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("f"))
    packed = freqs.agg(
        F.array_sort(F.collect_list("f")).alias("ws"),
        F.count(F.lit(1)).cast("long").alias("n_symbols"),
        F.sum("f").cast("long").alias("total_chars"),
    )
    ent = freqs.crossJoin(
        F.broadcast(freqs.agg(F.sum("f").alias("tot")))
    ).agg(
        F.sum(
            F.expr(
                f"CAST(round(f * log2(CAST(tot AS DOUBLE) / f) * {NANO}) "
                "AS BIGINT)"
            )
        )
        .cast("long")
        .alias("entropy_nano")
    )
    packed = packed.crossJoin(F.broadcast(ent))

    def step(acc, _):
        ws = F.slice(acc, 2, F.size(acc) - 1)
        merged = F.element_at(ws, 1) + F.element_at(ws, 2)
        do = F.size(ws) >= 2
        new_ws = F.array_sort(
            F.concat(
                F.slice(ws, 3, F.greatest(F.size(ws) - 2, F.lit(0))),
                F.array(merged),
            )
        )
        return F.when(
            do, F.concat(F.array(F.element_at(acc, 1) + merged), new_ws)
        ).otherwise(acc)

    init = F.concat(F.array(F.lit(0).cast("long")), F.col("ws"))
    fin = F.aggregate(
        F.sequence(F.lit(1), F.lit(HUF_MAX_MERGES)), init, step
    )
    return packed.select(
        "n_symbols",
        "total_chars",
        F.element_at(fin, 1).alias("huffman_bits"),
        "entropy_nano",
    )


def q_elias_gamma_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per top term (module doc): (term, df, gamma_bits, raw_bits,
    ratio_milli)."""
    d = table(spark, sf_dir, "documents", spread=True)
    tw = d.select(
        F.col("doc_id").cast("long").alias("doc"),
        F.explode(
            F.array_distinct(tokens(F.lower(F.col("text"))))
        ).alias("term"),
    )
    top = (
        tw.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .orderBy(F.col("df").desc(), "term")
        .limit(EG_TERMS)
    )
    lists = (
        tw.join(F.broadcast(top), "term")
        .groupBy("term", "df")
        .agg(F.array_sort(F.collect_list("doc")).alias("docs"))
    )
    docs = F.col("docs")
    gaps = F.transform(
        F.sequence(F.lit(1), F.size(docs)),
        lambda i: F.when(
            i == 1, F.element_at(docs, 1) + 1
        ).otherwise(F.element_at(docs, i) - F.element_at(docs, i - 1)),
    )
    gbits = F.aggregate(
        gaps,
        F.lit(0).cast("long"),
        lambda acc, g: acc
        + (2 * (F.length(F.bin(g)) - 1) + 1).cast("long"),
    )
    return (
        lists.select(
            "term",
            "df",
            gbits.alias("gamma_bits"),
            (32 * F.col("df")).cast("long").alias("raw_bits"),
        )
        .withColumn(
            "ratio_milli",
            F.expr("(1000 * gamma_bits) div raw_bits"),
        )
        .orderBy(F.col("df").desc(), "term")
    )


_TOKS = DUCK_TOKENS.format(x="lower(text)")

_HUF_STEP = (
    "CASE WHEN len(acc) - 1 >= 2 THEN "
    "list_concat([acc[1] + acc[2] + acc[3]], "
    "list_sort(list_concat(list_slice(acc, 4, len(acc)), "
    "[acc[2] + acc[3]]))) "
    "ELSE acc END"
)

_HUF_SQL = f"""
WITH ch AS (
    SELECT unnest(string_split(text, '')) AS c FROM documents
),
chf AS (SELECT c, count(*)::BIGINT AS f FROM ch WHERE c <> '' GROUP BY c),
packed AS (
    SELECT list_sort(list(f)) AS ws,
           count(*)::BIGINT AS n_symbols,
           sum(f)::BIGINT AS total_chars
    FROM chf
),
ent AS (
    SELECT sum(CAST(round(f * log2(CAST(tot AS DOUBLE) / f) * {NANO})
               AS BIGINT))::BIGINT AS entropy_nano
    FROM chf, (SELECT sum(f) AS tot FROM chf)
)
SELECT n_symbols, total_chars,
       list_reduce(
           list_prepend(list_prepend(0::BIGINT, ws),
               list_transform(generate_series(1, {HUF_MAX_MERGES}),
                              x -> [0::BIGINT])),
           (acc, xv) -> {_HUF_STEP})[1]::BIGINT AS huffman_bits,
       entropy_nano
FROM packed, ent
"""

_EG_SQL = f"""
WITH tw AS (
    SELECT doc_id::BIGINT AS doc,
           unnest(list_distinct({_TOKS})) AS term
    FROM documents
),
top AS (
    SELECT term, count(*)::BIGINT AS df FROM tw GROUP BY term
    ORDER BY df DESC, term LIMIT {EG_TERMS}
),
lists AS (
    SELECT t.term, t.df, list_sort(list(doc)) AS docs
    FROM tw JOIN top t USING (term)
    GROUP BY t.term, t.df
),
bits AS (
    SELECT term, df,
           list_sum(list_transform(generate_series(1, len(docs)),
               i -> 2 * (length(bin(CASE WHEN i = 1 THEN docs[1] + 1
                    ELSE docs[i] - docs[i - 1] END)) - 1) + 1))::BIGINT
               AS gamma_bits
    FROM lists
)
SELECT term, df, gamma_bits,
       (32 * df)::BIGINT AS raw_bits,
       ((1000 * gamma_bits) // (32 * df))::BIGINT AS ratio_milli
FROM bits
ORDER BY df DESC, term
"""

QUERIES = {
    "huffman_bits": q_huffman_bits,
    "elias_gamma_est": q_elias_gamma_est,
}

ORACLES = {
    "huffman_bits": _HUF_SQL,
    "elias_gamma_est": _EG_SQL,
}
