"""Compressibility signals, batch 103: a BWT+MTF compressed-size
estimate per document and the corpus bigram entropy rate — the two
engine-side stand-ins for the gzip-ratio quality filter every major
LLM-data pipeline runs (Gopher's repetition rules, CCNet's perplexity
buckets): highly compressible text is boilerplate/repetition,
incompressible text is noise/gibberish; both tails get filtered.

Scale design (100 TB):
- ``compress_ratio``: the whole Burrows–Wheeler → move-to-front →
  Elias-gamma pipeline runs INSIDE one row's codegen expression over a
  bounded 40-char prefix — zero joins, zero shuffles, no UDF, no gzip
  library. Rotations are a transform over positions, the BWT is the
  last column of the sorted rotation array (binary collation in both
  engines — ASCII input), and MTF is a fold whose accumulator is a
  FIXED-LENGTH flat int64 array ([bits_total, 26-letter alphabet]) —
  the flat-accumulator discipline (struct folds corrupt in DuckDB,
  re-measured in batch 101). Gamma bits use length(bin(idx+1)) — an
  exact integer log2, no floats anywhere. The BWT here is the
  sentinel-free metric variant (not invertible; compressibility is
  the point, not round-tripping).
- ``entropy_rate``: H(next char | char) over the corpus = −Σ p(a,b)·
  log2 p(b|a): one map-side bigram explode + two keyed aggregates to
  the alphabet²-bounded term table; log2 leaf-rounded 9dp (the
  naive_bayes libm discipline) and the final sum taken as the sorted
  fold (psi_drift idiom) so the float is bit-identical cross-engine.
  The information-theoretic floor the compress_ratio estimates sit
  above.

Reference parity: no quality layer in the reference; extends the
quality family (gopher_quality, repetition, char_entropy [unigram],
lm_commonness) with the compression axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

PREF = 40  # BWT window (bounded so the O(L²) rotation table stays tiny)
RND = 9


def q_compress_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per doc: BWT runs, MTF+gamma compressed bits, milli ratio vs
    8 bits/char (module doc)."""
    d = table(spark, sf_dir, "documents", spread=True)
    s = F.substring(F.regexp_replace(F.col("text"), r"\s+", ""), 1, PREF)
    base = d.select("doc_id", s.alias("s"))
    L = F.length("s").cast("long")
    sc = F.col("s")
    rots = F.array_sort(
        F.transform(
            F.sequence(F.lit(1).cast("long"), L),
            lambda i: F.concat(F.substr(sc, i), F.substr(sc, F.lit(1), i - 1)),
        )
    )
    bwt = F.array_join(
        F.transform(rots, lambda r: F.substr(r, L, F.lit(1))), ""
    )
    wb = base.withColumn("bwt", bwt)
    b = F.col("bwt")
    runs = F.when(
        L >= 2,
        1
        + F.aggregate(
            F.sequence(F.lit(2).cast("long"), L),
            F.lit(0).cast("long"),
            lambda a, i: a
            + (F.substr(b, i, F.lit(1)) != F.substr(b, i - 1, F.lit(1))).cast(
                "long"
            ),
        ),
    ).otherwise(F.lit(1).cast("long"))
    alpha0 = [F.lit(0).cast("long")] + [
        F.lit(97 + i).cast("long") for i in range(26)
    ]

    def mtf_step(acc, i):
        c = F.ascii(F.substr(b, i, F.lit(1))).cast("long")
        alpha = F.slice(acc, 2, 26)
        idx0 = F.array_position(alpha, c) - 1
        bits = 2 * F.length(F.bin(idx0 + 1)).cast("long") - 1
        return F.concat(
            F.array(F.get(acc, 0) + bits, c),
            F.filter(alpha, lambda x: x != c),
        )

    mtf_bits = F.get(
        F.aggregate(
            F.sequence(F.lit(1).cast("long"), L), F.array(*alpha0), mtf_step
        ),
        0,
    )
    return wb.select(
        "doc_id",
        L.alias("n_chars"),
        runs.alias("bwt_runs"),
        mtf_bits.alias("mtf_bits"),
        F.floor(mtf_bits * 1000 / (8 * L)).cast("long").alias("ratio_milli"),
    ).orderBy("doc_id")


_ALPHA0_SQL = "[CAST(0 AS BIGINT), " + ", ".join(
    f"CAST({97 + i} AS BIGINT)" for i in range(26)
) + "]"

_COMPRESS_SQL = f"""
WITH base AS (
    SELECT doc_id,
           substr(regexp_replace(text, '\\s+', '', 'g'), 1, {PREF}) AS s
    FROM documents
),
wb AS (
    SELECT doc_id, s, len(s)::BIGINT AS L,
           array_to_string(
               list_transform(
                   list_sort(list_transform(generate_series(1, len(s)),
                       i -> substr(s, CAST(i AS BIGINT))
                            || substr(s, 1, CAST(i - 1 AS BIGINT)))),
                   r -> substr(r, len(s), 1)),
               '') AS bwt
    FROM base
),
m AS (
    SELECT doc_id, L, bwt,
           1 + CAST(list_sum(list_transform(generate_series(2, L),
                   i -> CASE WHEN substr(bwt, CAST(i AS BIGINT), 1)
                              <> substr(bwt, CAST(i - 1 AS BIGINT), 1)
                             THEN 1 ELSE 0 END)) AS BIGINT) AS bwt_runs,
           list_reduce(
               list_prepend({_ALPHA0_SQL},
                            list_transform(generate_series(1, L),
                                           i -> [CAST(i AS BIGINT)])),
               (acc, iw) -> list_concat(
                   [acc[1] + 2 * len(bin(
                        list_position(acc[2:27],
                            ascii(substr(bwt, CAST(iw[1] AS BIGINT), 1))
                            ::BIGINT)::BIGINT)) - 1,
                    ascii(substr(bwt, CAST(iw[1] AS BIGINT), 1))::BIGINT],
                   list_filter(acc[2:27],
                       x -> x <> ascii(substr(bwt, CAST(iw[1] AS BIGINT), 1))
                            ::BIGINT))
           )[1] AS mtf_bits
    FROM wb
)
SELECT doc_id, L AS n_chars, bwt_runs, mtf_bits,
       CAST(floor(mtf_bits * 1000.0 / (8 * L)) AS BIGINT) AS ratio_milli
FROM m
ORDER BY doc_id
"""


def q_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram conditional entropy H(b|a), exact counts + the
    sorted-fold float sum (module doc)."""
    d = table(spark, sf_dir, "documents", spread=True)
    t = F.col("text")
    pairs = d.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1).cast("long"), F.length(t) - 1),
                lambda i: F.struct(
                    F.substr(t, i, F.lit(1)).alias("a"),
                    F.substr(t, i + 1, F.lit(1)).alias("b"),
                ),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    ab = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    aa = ab.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
    tot = ab.agg(
        F.sum("n_ab").alias("n_pairs"),
        F.count(F.lit(1)).alias("n_types"),
    )
    j = ab.join(aa, "a").crossJoin(F.broadcast(tot))
    lr = F.round(
        F.log2(F.col("n_ab").cast("double") / F.col("n_a").cast("double")),
        RND,
    )
    term = F.round(
        -(F.col("n_ab").cast("double") / F.col("n_pairs").cast("double"))
        * lr,
        RND,
    )
    terms = j.select("n_pairs", "n_types", term.alias("term"))
    return terms.groupBy("n_pairs", "n_types").agg(
        F.aggregate(
            F.sort_array(F.collect_list("term")),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("entropy_bits")
    )


_ENTROPY_SQL = f"""
WITH pairs AS (
    SELECT substr(text, CAST(i AS BIGINT), 1) AS a,
           substr(text, CAST(i + 1 AS BIGINT), 1) AS b
    FROM documents,
         LATERAL (SELECT unnest(generate_series(1, len(text) - 1)) AS i)
),
ab AS (SELECT a, b, count(*)::BIGINT AS n_ab FROM pairs GROUP BY a, b),
aa AS (SELECT a, sum(n_ab)::BIGINT AS n_a FROM ab GROUP BY a),
tot AS (SELECT sum(n_ab)::BIGINT AS n_pairs,
               count(*)::BIGINT AS n_types FROM ab),
terms AS (
    SELECT n_pairs, n_types,
           round(-(n_ab::DOUBLE / n_pairs::DOUBLE)
                 * round(log2(n_ab::DOUBLE / n_a::DOUBLE), {RND}),
                 {RND}) AS term
    FROM ab JOIN aa USING (a) CROSS JOIN tot
)
SELECT n_pairs, n_types,
       list_reduce(
           list_prepend(CAST(0 AS DOUBLE), list_sort(list(term))),
           (acc, x) -> acc + x
       ) AS entropy_bits
FROM terms
GROUP BY n_pairs, n_types
"""


QUERIES = {
    "compress_ratio": q_compress_ratio,
    "entropy_rate": q_entropy_rate,
}

ORACLES = {
    "compress_ratio": _COMPRESS_SQL,
    "entropy_rate": _ENTROPY_SQL,
}
