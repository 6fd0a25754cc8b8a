"""Privacy-transform + normalization surface, batch 59: k-anonymity
GENERALIZATION (the transformation ``k_anon_audit`` only measures) and
cross-source quantile normalization (the rank-join preprocessing step
that forces every source's feature distribution onto the pooled one).

Scale design (100 TB):
- ``k_anon_generalize`` picks the minimal generalization level whose
  quasi-identifier groups all reach K: one pass explodes each row into
  the 13 candidate levels (constant fan-out, map-side), one groupBy
  yields every level's group sizes, a 13-row minimum table picks L*
  (collected — level-count-sized, the kmeans-centroid precedent), and
  the output is the single groupBy at L*. No per-level rescan of the
  table — the lattice walk costs 13× one aggregation, not 13 scans.
- ``quantile_norm`` ranks WITHIN each source partition (parallel
  windows, never a global sort), aggregates per-rank pooled sums
  (rank-table-sized), and joins back on rank. Normalized values ship
  as exact rationals (pool_sum, pool_cnt) so no float crosses
  engines; sources of unequal size keep their own rank support.

Reference parity: no privacy/normalization layer in the reference;
extends ``k_anon_audit``/``l_diversity`` (measure → transform) and the
feature-scaling family (``winsorize``, ``quality_score``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import table

K_ANON = 5
MAX_LEVEL = 12
BASE_CENTS = 10_000  # level-0 bucket: $100


def q_k_anon_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalize customer (nationkey, acctbal-bucket) quasi-identifiers
    to the MINIMAL level L where every group has ≥ K members; emit the
    anonymized groups at that level."""
    cust = table(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    lvls = F.array(*[F.lit(i) for i in range(MAX_LEVEL + 1)])
    per_level = (
        cust.select(
            "c_nationkey", "cents", F.explode(lvls).alias("lvl")
        )
        .select(
            "lvl", "c_nationkey",
            F.floor(
                F.col("cents")
                / (F.lit(BASE_CENTS) * F.pow(F.lit(2.0), F.col("lvl")))
            ).cast("long").alias("bucket"),
        )
        .groupBy("lvl", "c_nationkey", "bucket")
        .agg(F.count("*").alias("n"))
    )
    min_sizes = (
        per_level.groupBy("lvl").agg(F.min("n").alias("min_n"))
        .orderBy("lvl")
        .collect()
    )  # 13 rows — level-lattice-sized, never data-sized
    l_star = next(
        (r["lvl"] for r in min_sizes if r["min_n"] >= K_ANON), MAX_LEVEL
    )
    return per_level.filter(F.col("lvl") == l_star).select(
        F.lit(l_star).cast("long").alias("lvl"),
        "c_nationkey", "bucket", "n",
    )


_KANON_SQL = f"""
WITH cust AS (
    SELECT c_nationkey, round(c_acctbal * 100)::BIGINT AS cents
    FROM customer
),
per_level AS (
    SELECT lvl, c_nationkey,
           floor(cents / ({BASE_CENTS} * pow(2.0, lvl)))::BIGINT AS bucket,
           count(*) AS n
    FROM cust, (SELECT unnest(generate_series(0, {MAX_LEVEL})) AS lvl)
    GROUP BY 1, 2, 3
),
l_star AS (
    SELECT coalesce(min(lvl), {MAX_LEVEL}) AS l FROM (
        SELECT lvl FROM per_level GROUP BY lvl
        HAVING min(n) >= {K_ANON}
    )
)
SELECT l_star.l::BIGINT AS lvl, c_nationkey, bucket, n::BIGINT AS n
FROM per_level JOIN l_star ON per_level.lvl = l_star.l
"""


def q_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalize document length across sources: each doc's
    value becomes the pooled mean of its within-source rank, as the
    exact rational (pool_sum, pool_cnt)."""
    d = table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("v")
    )
    w = Window.partitionBy("source").orderBy("v", "doc_id")
    ranked = d.select(
        "doc_id", "source", "v", F.row_number().over(w).alias("r")
    )
    pooled = ranked.groupBy("r").agg(
        F.sum("v").alias("pool_sum"), F.count("*").alias("pool_cnt")
    )
    return ranked.join(pooled, "r").select(
        "doc_id", "source", F.col("r").cast("long").alias("r"),
        "v", "pool_sum", "pool_cnt",
    )


_QNORM_SQL = """
WITH ranked AS (
    SELECT doc_id, source, n_chars::BIGINT AS v,
           row_number() OVER (PARTITION BY source
                              ORDER BY n_chars, doc_id) AS r
    FROM documents
),
pooled AS (
    SELECT r, sum(v) AS pool_sum, count(*) AS pool_cnt
    FROM ranked GROUP BY r
)
SELECT doc_id, source, r::BIGINT AS r, v,
       pool_sum::BIGINT AS pool_sum, pool_cnt::BIGINT AS pool_cnt
FROM ranked JOIN pooled USING (r)
"""


QUERIES = {
    "k_anon_generalize": q_k_anon_generalize,
    "quantile_norm": q_quantile_norm,
}

ORACLES = {
    "k_anon_generalize": _KANON_SQL,
    "quantile_norm": _QNORM_SQL,
}
