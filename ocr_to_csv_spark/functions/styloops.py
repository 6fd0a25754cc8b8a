"""Stylometry, batch 150: Burrows' Delta authorship distance between
sources and Yule's K vocabulary-richness — the classic attribution
measure (Burrows 2002) and the frequency-spectrum constant, both over
the documents table's source partitions.

Scale design (100 TB):
- ``burrows_delta``: the corpus-scale work is TWO keyed aggregates —
  top-W=20 words by total count (TakeOrderedAndProject) and the
  zero-filled (word, source) count grid (words × sources left join —
  bounded W·S). The grid collapses to ONE row (array_sort'ed struct
  list, stride S), and every float step — relative frequencies, per-
  word μ/σ across sources, z-scores, pairwise mean |Δz| — is a
  bounded in-row fold in a FIXED order on both engines (list_reduce
  with the prepend trick in the oracle, never list_sum, so the
  rounding sequence is identical), 9dp on output. σ=0 words (possible
  on a templated corpus) contribute 0 by CASE in both engines.
- ``yule_k``: per source, K = 10⁴·(Σ_m m²V_m − N)/N² from the
  frequency spectrum — Σ m²V_m is just Σ_types f², ONE (source, word)
  agg + ONE source agg, all exact int64; k_micro = 10¹⁰·(S−N) div N²
  (numerator ≤ 10¹⁰·N·f_max, inside int64 at any per-source shard a
  sane partitioning produces — the per-source computation shards
  freely).

Reference parity: no stylometry layer in the reference; extends
source_drift, lang_confusion, hapax_ratio, zipf_fit, heaps_fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import DUCK_TOKENS, table, tokens

BD_WORDS = 20


def _word_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    return d.select(
        F.col("source").alias("src"),
        F.explode(tokens(F.lower(F.col("text")))).alias("w"),
    )


def q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Burrows' Delta between sources over the top-BD_WORDS
    function words (module doc): (src_a, src_b, delta)."""
    ws = _word_source(spark, sf_dir)
    top = (
        ws.groupBy("w")
        .agg(F.count(F.lit(1)).alias("tot"))
        .orderBy(F.col("tot").desc(), "w")
        .limit(BD_WORDS)
        .select("w")
    )
    per_src = ws.groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    counts = (
        ws.join(F.broadcast(top), "w")
        .groupBy("w", "src")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    grid = (
        top.crossJoin(per_src)
        .join(counts, ["w", "src"], "left")
        .select(
            "w", "src", F.coalesce("c", F.lit(0)).cast("long").alias("c"),
            F.col("n").cast("long").alias("n"),
        )
    )
    packed = grid.agg(
        F.array_sort(
            F.collect_list(F.struct("w", "src", "c", "n"))
        ).alias("g"),
        F.array_sort(F.collect_set("src")).alias("srcs"),
        F.array_sort(F.collect_set("w")).alias("words"),
    )
    g = F.col("g")
    s = F.size("srcs")
    wn = F.size("words")
    fs = F.transform(
        g, lambda x: x["c"].cast("double") / x["n"].cast("double")
    )
    sidx = F.sequence(F.lit(0), s - 1)
    widx = F.sequence(F.lit(0), wn - 1)

    def fsat(wi, j):
        return F.element_at(fs, wi * s + j + 1)

    mu = F.transform(
        widx,
        lambda wi: F.aggregate(
            sidx, F.lit(0.0), lambda acc, j: acc + fsat(wi, j)
        )
        / s.cast("double"),
    )
    packed = packed.withColumn("fs", fs).withColumn("mu", mu)
    fs2, mu2 = F.col("fs"), F.col("mu")

    def fsat2(wi, j):
        return F.element_at(fs2, wi * s + j + 1)

    sd = F.transform(
        widx,
        lambda wi: F.sqrt(
            F.aggregate(
                sidx,
                F.lit(0.0),
                lambda acc, j: acc
                + (fsat2(wi, j) - F.element_at(mu2, wi + 1))
                * (fsat2(wi, j) - F.element_at(mu2, wi + 1)),
            )
            / s.cast("double")
        ),
    )
    packed = packed.withColumn("sd", sd)
    fs3, mu3, sd3 = F.col("fs"), F.col("mu"), F.col("sd")

    def z(wi, j):
        return (
            F.element_at(fs3, wi * s + j + 1) - F.element_at(mu3, wi + 1)
        ) / F.element_at(sd3, wi + 1)

    pair_idx = F.filter(
        F.sequence(F.lit(0), s * s - 1),
        lambda p: (p % s) > F.floor(p / s),
    )
    pairs = F.transform(
        pair_idx,
        lambda p: F.struct(
            F.element_at(F.col("srcs"), F.floor(p / s).cast("int") + 1).alias(
                "src_a"
            ),
            F.element_at(F.col("srcs"), (p % s).cast("int") + 1).alias(
                "src_b"
            ),
            F.round(
                F.aggregate(
                    widx,
                    F.lit(0.0),
                    lambda acc, wi: acc
                    + F.when(
                        F.element_at(sd3, wi + 1) > 0,
                        F.abs(
                            z(wi, F.floor(p / s).cast("int"))
                            - z(wi, (p % s).cast("int"))
                        ),
                    ).otherwise(F.lit(0.0)),
                )
                / wn.cast("double"),
                9,
            ).alias("delta"),
        ),
    )
    return (
        packed.select(F.explode(pairs).alias("p"))
        .select("p.src_a", "p.src_b", "p.delta")
        .orderBy("src_a", "src_b")
    )


def q_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's K per source (module doc): (src, n_tokens, n_types,
    sum_f2, k_micro)."""
    ws = _word_source(spark, sf_dir)
    per_type = ws.groupBy("src", "w").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    return (
        per_type.groupBy("src")
        .agg(
            F.sum("f").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum(F.col("f") * F.col("f")).cast("long").alias("sum_f2"),
        )
        .select(
            "src",
            "n_tokens",
            "n_types",
            "sum_f2",
            F.expr(
                "(10000000000L * (sum_f2 - n_tokens)) div "
                "(n_tokens * n_tokens)"
            ).alias("k_micro"),
        )
        .orderBy("src")
    )


_TOKS = DUCK_TOKENS.format(x="lower(text)")

_WS_CTE = f"""
ws AS (
    SELECT source AS src, unnest({_TOKS}) AS w FROM documents
)"""


def _bd_sql() -> str:
    # identical structure: grid → one-row lists → fixed-order folds
    fsat = "fs[wi * s + j + 1]"
    mu_fold = (
        "list_transform(generate_series(0, wn - 1), wi -> "
        "list_reduce(list_prepend([0.0::DOUBLE], "
        "list_transform(generate_series(0, s - 1), "
        f"j -> [{fsat}])), (acc, jv) -> [acc[1] + jv[1]])[1] / s)"
    )
    sd_fold = (
        "list_transform(generate_series(0, wn - 1), wi -> "
        "sqrt(list_reduce(list_prepend([0.0::DOUBLE], "
        "list_transform(generate_series(0, s - 1), "
        f"j -> [{fsat}])), "
        "(acc, jv) -> [acc[1] + (jv[1] - mu[wi + 1]) * (jv[1] - mu[wi + 1])]"
        ")[1] / s))"
    )
    zi = "((fs[wi * s + (p // s) + 1] - mu[wi + 1]) / sd[wi + 1])"
    zj = "((fs[wi * s + (p % s) + 1] - mu[wi + 1]) / sd[wi + 1])"
    delta_fold = (
        "round(list_reduce(list_prepend([0.0::DOUBLE], "
        "list_transform(generate_series(0, wn - 1), wi -> "
        f"[CASE WHEN sd[wi + 1] > 0 THEN abs({zi} - {zj}) "
        "ELSE 0.0 END])), (acc, wv) -> [acc[1] + wv[1]])[1] / wn, 9)"
    )
    return f"""
WITH {_WS_CTE},
top AS (
    SELECT w FROM (
        SELECT w, count(*) AS tot FROM ws GROUP BY w
        ORDER BY tot DESC, w LIMIT {BD_WORDS})
),
per_src AS (SELECT src, count(*)::BIGINT AS n FROM ws GROUP BY src),
counts AS (
    SELECT w, src, count(*)::BIGINT AS c
    FROM ws JOIN top USING (w) GROUP BY w, src
),
grid AS (
    SELECT t.w, p.src, coalesce(c.c, 0)::BIGINT AS c, p.n
    FROM top t CROSS JOIN per_src p
    LEFT JOIN counts c ON c.w = t.w AND c.src = p.src
),
packed AS (
    SELECT list(struct_pack(w := w, src := src, c := c, n := n)
                ORDER BY w, src) AS gl,
           list_sort(list(DISTINCT src)) AS srcs,
           list_sort(list(DISTINCT w)) AS words
    FROM grid
),
l0 AS (
    SELECT srcs, len(srcs) AS s, len(words) AS wn,
           list_transform(gl, x -> CAST(x.c AS DOUBLE) / x.n) AS fs
    FROM packed
),
l1 AS (SELECT *, {mu_fold} AS mu FROM l0),
l2 AS (SELECT *, {sd_fold} AS sd FROM l1),
l3 AS (
    SELECT srcs, s, wn, fs, mu, sd,
           unnest(list_filter(generate_series(0, s * s - 1),
                              p -> (p % s) > (p // s))) AS p
    FROM l2
)
SELECT srcs[(p // s) + 1] AS src_a,
       srcs[(p % s) + 1] AS src_b,
       {delta_fold} AS delta
FROM l3
ORDER BY src_a, src_b
"""


_YULE_SQL = f"""
WITH {_WS_CTE},
per_type AS (
    SELECT src, w, count(*)::BIGINT AS f FROM ws GROUP BY src, w
)
SELECT src,
       sum(f)::BIGINT AS n_tokens,
       count(*)::BIGINT AS n_types,
       sum(f * f)::BIGINT AS sum_f2,
       ((10000000000 * (sum(f * f) - sum(f))) // (sum(f) * sum(f)))
           ::BIGINT AS k_micro
FROM per_type
GROUP BY src
ORDER BY src
"""

QUERIES = {
    "burrows_delta": q_burrows_delta,
    "yule_k": q_yule_k,
}

ORACLES = {
    "burrows_delta": _bd_sql(),
    "yule_k": _YULE_SQL,
}
