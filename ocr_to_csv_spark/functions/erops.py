"""Entity-resolution + ranking-eval operators, batch 69:
sorted-neighborhood blocking and mean reciprocal rank.

Scale design (100 TB):
- ``snm_pairs`` (sorted-neighborhood method, Hernández & Stolfo 1995):
  the OTHER classic ER blocking strategy next to ``record_linkage``'s
  hash blocking — sort all records on a fuzzy key and emit candidate
  pairs within a fixed window W of the sorted order, so near-misses
  that hash blocking separates (e.g. balances 199999 vs 200001 in
  different buckets) still pair. Plan: one global row_number (the
  sandbox form — at 10^12 rows SNM is run exactly as the literature
  prescribes: range-partitioned sort with W-row overlap between
  adjacent runs, same output, no global window), then the window join
  is W EQUI-joins on rank+d (offset explode → join on the rank key),
  never a range join or cross join. Scores are exact integer cent
  distances; the ``is_match`` flag is the |Δcents| ≤ threshold
  decision.
- ``mrr_eval``: mean reciprocal rank of the first URGENT order in each
  customer's price-ranked order list — the standard retrieval-eval
  statistic alongside ``ndcg``/``pr_at_k``. Per-customer rank comes
  from one partitioned window; rr = 1/rank is one exact IEEE division;
  the GLOBAL mean is a sorted-fold sum (Spark ``aggregate`` over
  ``sort_array(collect_list(...))`` == DuckDB ``list_reduce`` over
  ``list_sort(list(...))``) so the double addition order is
  bit-identical across engines — the repo's standard float-parity
  discipline (util.py module doc).

Reference parity: no ER/eval layer in the reference; extends
``record_linkage``/``er_golden`` (blocking strategies) and the
retrieval-eval family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import table

SNM_WINDOW = 3
SNM_MATCH_CENTS = 5_000  # |Δ acctbal| ≤ $50 → candidate match


def q_snm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood candidate pairs over customers sorted by
    (segment, balance cents); see module docstring."""
    c = table(spark, sf_dir, "customer")
    recs = c.select(
        F.col("c_custkey").alias("key"),
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    ranked = recs.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy("seg", "cents", "key")).cast("long"),
    )
    offs = ranked.select(
        "rnk", "key", "seg", "cents",
        F.explode(F.sequence(F.lit(1), F.lit(SNM_WINDOW))).alias("d"),
    ).select(
        (F.col("rnk") + F.col("d")).alias("rnk"),
        F.col("key").alias("key_a"),
        F.col("seg").alias("seg_a"),
        F.col("cents").alias("cents_a"),
        "d",
    )
    pairs = offs.join(
        ranked.select(
            "rnk",
            F.col("key").alias("key_b"),
            F.col("seg").alias("seg_b"),
            F.col("cents").alias("cents_b"),
        ),
        "rnk",
    )
    dist = F.abs(F.col("cents_a") - F.col("cents_b"))
    return pairs.select(
        "key_a",
        "key_b",
        F.col("d").alias("rank_dist"),
        dist.alias("cents_dist"),
        (F.col("seg_a") == F.col("seg_b")).cast("long").alias("same_seg"),
        (
            (F.col("seg_a") == F.col("seg_b")) & (dist <= SNM_MATCH_CENTS)
        ).cast("long").alias("is_match"),
    ).orderBy("key_a", "key_b", "rank_dist")


_SNM_SQL = f"""
WITH recs AS (
    SELECT c_custkey AS key, c_mktsegment AS seg,
           CAST(round(c_acctbal * 100) AS BIGINT) AS cents
    FROM customer
),
ranked AS (
    SELECT *, CAST(row_number() OVER (ORDER BY seg, cents, key) AS BIGINT)
              AS rnk
    FROM recs
),
offs AS (
    SELECT r.rnk + d.d AS rnk, r.key AS key_a, r.seg AS seg_a,
           r.cents AS cents_a, d.d
    FROM ranked r CROSS JOIN (SELECT unnest(range(1, {SNM_WINDOW + 1})) AS d) d
)
SELECT o.key_a, b.key AS key_b, o.d AS rank_dist,
       abs(o.cents_a - b.cents) AS cents_dist,
       CAST(o.seg_a = b.seg AS BIGINT) AS same_seg,
       CAST(o.seg_a = b.seg
            AND abs(o.cents_a - b.cents) <= {SNM_MATCH_CENTS}
            AS BIGINT) AS is_match
FROM offs o JOIN ranked b ON b.rnk = o.rnk
ORDER BY key_a, key_b, rank_dist
"""


def q_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank of the first URGENT order per customer
    (price-ranked); sorted-fold global mean (module docstring)."""
    o = table(spark, sf_dir, "orders")
    ranked = o.select(
        "o_custkey",
        "o_orderpriority",
        F.row_number().over(
            Window.partitionBy("o_custkey").orderBy(
                F.desc("o_totalprice"), F.asc("o_orderkey")
            )
        ).cast("long").alias("rnk"),
    )
    firsts = (
        ranked.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.min("rnk").alias("first_rank"))
    )
    rr = firsts.select(
        (F.lit(1.0) / F.col("first_rank").cast("double")).alias("rr")
    )
    agg = rr.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.aggregate(
            F.sort_array(F.collect_list("rr")),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("rr_sum"),
    )
    return agg.select(
        "n_queries",
        "rr_sum",
        (F.col("rr_sum") / F.col("n_queries").cast("double")).alias("mrr"),
    )


_MRR_SQL = """
WITH ranked AS (
    SELECT o_custkey, o_orderpriority,
           CAST(row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rnk
    FROM orders
),
firsts AS (
    SELECT o_custkey, min(rnk) AS first_rank
    FROM ranked WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_custkey
),
rr AS (SELECT 1.0 / CAST(first_rank AS DOUBLE) AS rr FROM firsts)
SELECT count(*) AS n_queries,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                list_sort(list(rr))),
                   (a, b) -> a + b) AS rr_sum,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                list_sort(list(rr))),
                   (a, b) -> a + b) / CAST(count(*) AS DOUBLE) AS mrr
FROM rr
"""


QUERIES = {
    "snm_pairs": q_snm_pairs,
    "mrr_eval": q_mrr_eval,
}

ORACLES = {
    "snm_pairs": _SNM_SQL,
    "mrr_eval": _MRR_SQL,
}
