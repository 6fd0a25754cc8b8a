"""Corpus linguistics, batch 149: Dunning log-likelihood-ratio
collocation discovery and the keyword-in-context concordance — the
significance-tested phrase detector next to cooc_pmi (PMI rewards
rarity; G² rewards evidence) and the corpus-inspection tool every
curation analyst actually runs.

Scale design (100 TB):
- ``collocation_llr``: bigram and unigram counts are TWO keyed
  aggregates over the token explode; only bigrams with count ≥
  MIN_PAIR survive to scoring (the DF-cap discipline — the long tail
  never reaches the join). The 2×2 contingency per candidate is
  exact int64 (k11, c1, c2, N); each of the four G² cells
  k·ln(k·N/(row·col)) is leaf-rounded to INTEGER nano (0·ln0 = 0 by
  CASE), so the emitted g2_nano is pure int64 and the top-15 is a
  TakeOrderedAndProject under a total order.
- ``kwic_concordance``: occurrences of the fixed keyword explode with
  their positions; left/right contexts are bounded slices of the
  SAME token array — one scan, no join, output bounded by keyword
  frequency.

Reference parity: no corpus-linguistics layer in the reference;
extends cooc_pmi (graphtext), phrase_search, rake_keywords,
lm_bigram/kn_bigram.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import DUCK_TOKENS, table, tokens

MIN_PAIR = 5
LLR_TOP = 15
KWIC_WORD = "spark"
KWIC_CTX = 3
NANO = 1_000_000_000


def _tok_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    return d.select(
        "doc_id", tokens(F.lower(F.col("text"))).alias("toks")
    )


def _cell_nano(k: Column, row: Column, col: Column, n: Column) -> Column:
    """round(k·ln(k·N/(row·col))·1e9) with the 0·ln0 = 0 convention."""
    return F.when(k > 0,
        F.round(
            k.cast("double")
            * F.ln(
                (k.cast("double") * n.cast("double"))
                / (row.cast("double") * col.cast("double"))
            )
            * NANO
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))


def q_collocation_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-LLR_TOP bigrams by Dunning G² (module doc):
    (w1, w2, k11, c1, c2, n, g2_nano)."""
    t = _tok_df(spark, sf_dir)
    pos = t.select(F.posexplode("toks").alias("i", "w"), "toks")
    bigrams = pos.filter(
        F.col("i") + 1 < F.size("toks")
    ).select(
        F.col("w").alias("w1"),
        F.element_at(F.col("toks"), F.col("i") + 2).alias("w2"),
    )
    bc = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("k11")
    ).filter(F.col("k11") >= MIN_PAIR)
    # unigram counts as BIGRAM-POSITION counts (first/second slots), so
    # the 2x2 margins are consistent: n = total bigram positions
    uni1 = bigrams.groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("c1")
    )
    uni2 = bigrams.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("c2")
    )
    nn = bigrams.agg(F.count(F.lit(1)).cast("long").alias("n"))
    j = (
        bc.join(uni1, "w1")
        .join(uni2, "w2")
        .crossJoin(F.broadcast(nn))
    )
    k11 = F.col("k11")
    c1, c2, n = F.col("c1"), F.col("c2"), F.col("n")
    k12 = c1 - k11
    k21 = c2 - k11
    k22 = n - c1 - c2 + k11
    g2 = F.lit(2).cast("long") * (
        _cell_nano(k11, c1, c2, n)
        + _cell_nano(k12, c1, n - c2, n)
        + _cell_nano(k21, n - c1, c2, n)
        + _cell_nano(k22, n - c1, n - c2, n)
    )
    return (
        j.select("w1", "w2", "k11", "c1", "c2", "n", g2.alias("g2_nano"))
        .orderBy(F.col("g2_nano").desc(), "w1", "w2")
        .limit(LLR_TOP)
    )


def q_kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context lines for KWIC_WORD (module doc):
    (doc_id, off, left_ctx, right_ctx)."""
    t = _tok_df(spark, sf_dir)
    pos = t.select(
        "doc_id", "toks", F.posexplode("toks").alias("i", "w")
    ).filter(F.col("w") == KWIC_WORD)
    off = F.col("i") + 1  # 1-based token offset
    left = F.array_join(
        F.slice(
            F.col("toks"),
            F.greatest(off - KWIC_CTX, F.lit(1)),
            F.least(F.lit(KWIC_CTX), off - 1),
        ),
        " ",
    )
    right = F.array_join(
        F.slice(F.col("toks"), off + 1, F.lit(KWIC_CTX)), " "
    )
    return pos.select(
        "doc_id",
        off.cast("long").alias("off"),
        left.alias("left_ctx"),
        right.alias("right_ctx"),
    ).orderBy("doc_id", "off")


_TOKS = DUCK_TOKENS.format(x="lower(text)")


def _cell_sql(k: str, row: str, col: str) -> str:
    return (
        f"(CASE WHEN {k} > 0 THEN CAST(round(CAST({k} AS DOUBLE) * "
        f"ln((CAST({k} AS DOUBLE) * CAST(n AS DOUBLE)) / "
        f"(CAST({row} AS DOUBLE) * CAST({col} AS DOUBLE))) * {NANO}) "
        f"AS BIGINT) ELSE 0 END)"
    )


_LLR_SQL = f"""
WITH tk AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
pos AS (
    SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
    FROM tk
),
bigrams AS (SELECT toks[i] AS w1, toks[i + 1] AS w2 FROM pos),
bc AS (
    SELECT w1, w2, count(*)::BIGINT AS k11 FROM bigrams
    GROUP BY w1, w2 HAVING count(*) >= {MIN_PAIR}
),
uni1 AS (SELECT w1, count(*)::BIGINT AS c1 FROM bigrams GROUP BY w1),
uni2 AS (SELECT w2, count(*)::BIGINT AS c2 FROM bigrams GROUP BY w2),
nn AS (SELECT count(*)::BIGINT AS n FROM bigrams),
j AS (
    SELECT bc.w1, bc.w2, k11, c1, c2, n
    FROM bc JOIN uni1 USING (w1) JOIN uni2 USING (w2), nn
)
SELECT w1, w2, k11, c1, c2, n,
       2 * ({_cell_sql('k11', 'c1', 'c2')}
          + {_cell_sql('(c1 - k11)', 'c1', '(n - c2)')}
          + {_cell_sql('(c2 - k11)', '(n - c1)', 'c2')}
          + {_cell_sql('(n - c1 - c2 + k11)', '(n - c1)', '(n - c2)')})
           ::BIGINT AS g2_nano
FROM j
ORDER BY g2_nano DESC, w1, w2
LIMIT {LLR_TOP}
"""

_KWIC_SQL = f"""
WITH tk AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
pos AS (
    SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS off
    FROM tk
)
SELECT doc_id, off::BIGINT AS off,
       coalesce(array_to_string(list_slice(toks,
           greatest(off - {KWIC_CTX}, 1), off - 1), ' '), '') AS left_ctx,
       coalesce(array_to_string(list_slice(toks, off + 1,
           off + {KWIC_CTX}), ' '), '') AS right_ctx
FROM pos
WHERE toks[off] = '{KWIC_WORD}'
ORDER BY doc_id, off
"""

QUERIES = {
    "collocation_llr": q_collocation_llr,
    "kwic_concordance": q_kwic_concordance,
}

ORACLES = {
    "collocation_llr": _LLR_SQL,
    "kwic_concordance": _KWIC_SQL,
}
