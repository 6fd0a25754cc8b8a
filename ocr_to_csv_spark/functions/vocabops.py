"""Vocabulary-richness estimation, batch 98: the Good–Turing smoothing
table and the Chao1 species-richness estimate over the corpus token
frequency spectrum — the "how much vocabulary have we NOT crawled yet"
readouts that size tokenizer vocab and dedup budgets before training.

Scale design (100 TB):
- Both ride the frequency-of-frequencies table: tokens explode
  map-side, ONE keyed aggregate gives per-type counts r, a SECOND
  keyed aggregate collapses to (r, N_r) — a table bounded by the
  number of DISTINCT frequencies (≤ a few thousand even at 10^12
  tokens, Zipf guarantees it). Everything after that second shuffle is
  metadata-scale.
- ``good_turing``: the adjusted count r* = (r+1)·N_{r+1}/N_r for
  r = 1..R_MAX, emitted as the exact integer rational (num, den) plus
  its one-division float — the smoothing row a KenLM-style LM build
  consumes. N_{r+1} arrives by a LEFT equi-join of the tiny spectrum
  table with itself on r+1, never a window over the token table.
- ``chao1``: S_chao1 = S_obs + f1²/(2·f2) and the bias-corrected
  variant S_obs + f1·(f1−1)/(2·(f2+1)), plus the Good–Turing unseen
  probability mass p0 = f1/N — each one division over exact int64
  moments from a single pass over the spectrum. The token-level
  counterpart of ``capture_recapture`` (user coverage) and the
  corpus-growth planner behind ``vocab_coverage``.

Reference parity: no corpus-statistics layer in the reference; extends
the spectrum family (hapax_ratio, zipf_fit, vocab_coverage) with the
estimation half.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import DUCK_TOKENS, duck_ngrams, ngrams, table

R_MAX = 8  # Good–Turing rows r = 1..R_MAX (LM smoothing uses small r)
GRAM_N = 3  # species = word trigrams: the synthetic corpus's word-level
# unigram spectrum is DEGENERATE (a small closed vocabulary where every
# word occurs ~900 times — no f1/f2 mass at all, measured), while its
# trigram spectrum is properly Zipf-shaped (f1 ≈ 9.4k, f2 ≈ 4.5k at
# sf0.01) — and trigram novelty is the quantity an LM-data pipeline
# actually tracks (decontam / lm_bigram operate at the same grain).


def _spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(r, n_types): number of trigram types occurring exactly r times."""
    d = table(spark, sf_dir, "documents", spread=True)
    tok = d.select(F.explode(ngrams(F.col("text"), GRAM_N)).alias("tok"))
    counts = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("r"))
    return counts.groupBy("r").agg(F.count(F.lit(1)).alias("n_types"))


_SPECTRUM_SQL = f"""
    SELECT r, count(*)::BIGINT AS n_types FROM (
        SELECT count(*)::BIGINT AS r FROM (
            SELECT unnest({duck_ngrams(GRAM_N)}) AS tok
            FROM (
                SELECT {DUCK_TOKENS.format(x='text')} AS toks FROM documents
            )
        ) GROUP BY tok
    ) GROUP BY r
"""


def q_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good–Turing adjusted counts for r = 1..R_MAX (module doc)."""
    spec = _spectrum(spark, sf_dir)
    cur = spec.filter(F.col("r") <= R_MAX)
    nxt = spec.select(
        (F.col("r") - 1).alias("r"), F.col("n_types").alias("n_next")
    )
    out = cur.join(nxt, "r", "left").select(
        F.col("r").cast("long").alias("r"),
        F.col("n_types").cast("long").alias("n_types"),
        F.coalesce("n_next", F.lit(0)).cast("long").alias("n_next"),
    )
    return out.select(
        "r",
        "n_types",
        "n_next",
        ((F.col("r") + 1) * F.col("n_next")).cast("long").alias("rstar_num"),
        F.col("n_types").alias("rstar_den"),
        (
            ((F.col("r") + 1) * F.col("n_next")).cast("double")
            / F.col("n_types").cast("double")
        ).alias("r_star"),
    ).orderBy("r")


_GT_SQL = f"""
    WITH spec AS ({_SPECTRUM_SQL})
    SELECT c.r::BIGINT AS r, c.n_types::BIGINT AS n_types,
           COALESCE(n.n_types, 0)::BIGINT AS n_next,
           ((c.r + 1) * COALESCE(n.n_types, 0))::BIGINT AS rstar_num,
           c.n_types::BIGINT AS rstar_den,
           CAST((c.r + 1) * COALESCE(n.n_types, 0) AS DOUBLE)
               / CAST(c.n_types AS DOUBLE) AS r_star
    FROM spec c LEFT JOIN spec n ON n.r = c.r + 1
    WHERE c.r <= {R_MAX}
    ORDER BY r
"""


def q_chao1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 richness + bias-corrected variant + Good–Turing unseen
    mass p0, one row of exact moments + three single divisions."""
    spec = _spectrum(spark, sf_dir)
    agg = spec.agg(
        F.sum("n_types").alias("s_obs"),
        F.sum(F.col("r") * F.col("n_types")).alias("n_tokens"),
        F.sum(F.when(F.col("r") == 1, F.col("n_types")).otherwise(0)).alias(
            "f1"
        ),
        F.sum(F.when(F.col("r") == 2, F.col("n_types")).otherwise(0)).alias(
            "f2"
        ),
    )
    s, n, f1, f2 = (F.col(c) for c in ("s_obs", "n_tokens", "f1", "f2"))
    return agg.select(
        s.cast("long").alias("s_obs"),
        n.cast("long").alias("n_tokens"),
        f1.cast("long").alias("f1"),
        f2.cast("long").alias("f2"),
        (
            s.cast("double")
            + (f1 * f1).cast("double") / (2 * f2).cast("double")
        ).alias("chao1"),
        (
            s.cast("double")
            + (f1 * (f1 - 1)).cast("double") / (2 * (f2 + 1)).cast("double")
        ).alias("chao1_bc"),
        (f1.cast("double") / n.cast("double")).alias("p0"),
    )


_CHAO1_SQL = f"""
    WITH spec AS ({_SPECTRUM_SQL}),
    m AS (
        SELECT sum(n_types)::BIGINT AS s_obs,
               sum(r * n_types)::BIGINT AS n_tokens,
               sum(CASE WHEN r = 1 THEN n_types ELSE 0 END)::BIGINT AS f1,
               sum(CASE WHEN r = 2 THEN n_types ELSE 0 END)::BIGINT AS f2
        FROM spec
    )
    SELECT s_obs, n_tokens, f1, f2,
           CAST(s_obs AS DOUBLE)
               + CAST(f1 * f1 AS DOUBLE) / CAST(2 * f2 AS DOUBLE) AS chao1,
           CAST(s_obs AS DOUBLE)
               + CAST(f1 * (f1 - 1) AS DOUBLE)
                 / CAST(2 * (f2 + 1) AS DOUBLE) AS chao1_bc,
           CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS p0
    FROM m
"""


QUERIES = {
    "good_turing": q_good_turing,
    "chao1": q_chao1,
}

ORACLES = {
    "good_turing": _GT_SQL,
    "chao1": _CHAO1_SQL,
}
