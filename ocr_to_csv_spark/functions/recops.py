"""Recommendation-quality audits, batch 130: catalog coverage +
novelty of the co-visitation top-k recommender, and the Gini
concentration of recommendation exposure — the three numbers that
catch a recommender collapsing onto its head items (high accuracy,
zero discovery) before it ships.

Scale design (100 TB):
- The co-visitation table is the basket_pairs discipline: ONE
  self-equi-join on the order key with per-order fan-out bounded by
  basket size, then a keyed count; the top-K=3 per item is a
  WindowGroupLimit. Items are bounded to a 500-key catalog
  (l_partkey % 500) so every downstream table is catalog-bounded
  metadata.
- ``rec_coverage``: coverage = distinct recommended ÷ catalog (exact
  milli); novelty = mean −log2(popularity share) over recommended
  pairs, each term leaf-rounded to INTEGER nano-bits BEFORE the sum
  (heldout_ppl discipline). One summary row.
- ``rec_exposure_gini``: exposure e_i = how often item i appears as a
  recommendation (0 for never — the zero-filled catalog left join);
  Gini = (2Σr·e − (n+1)Σe)·1000 div (n·Σe) over the (e, item)
  rank — one window over the catalog-bounded table, exact ints.

Reference parity: no recommender layer in the reference; completes the
rec family (item_cf, cooccurrence, basket_pairs, ndcg/mrr) with the
catalog-health audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import table

REC_CAT = 500  # catalog size (l_partkey % REC_CAT)
REC_K = 3  # recommendations per item


def _covis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        (F.col("l_partkey") % REC_CAT).cast("long").alias("item"),
    ).distinct()
    a = li.select("ok", F.col("item").alias("a"))
    b = li.select("ok", F.col("item").alias("b"))
    return (
        a.join(b, "ok")
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _covis(spark, sf_dir)
    w = Window.partitionBy("a").orderBy(F.desc("cnt"), F.asc("b"))
    return pairs.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= REC_K
    )


_COVIS_SQL = f"""
    SELECT a.item AS a, b.item AS b, count(*)::BIGINT AS cnt
    FROM (SELECT DISTINCT l_orderkey AS ok, (l_partkey % {REC_CAT})::BIGINT
                 AS item FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey AS ok, (l_partkey % {REC_CAT})::BIGINT
                 AS item FROM lineitem) b USING (ok)
    WHERE a.item <> b.item
    GROUP BY a.item, b.item
"""

_RECS_SQL = f"""
    SELECT a, b, cnt,
           row_number() OVER (PARTITION BY a ORDER BY cnt DESC, b ASC) AS rk
    FROM ({_COVIS_SQL})
    QUALIFY rk <= {REC_K}
"""


def q_rec_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage + novelty of the top-K co-visitation recs
    (module doc): one row."""
    li = table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % REC_CAT).cast("long").alias("item")
    )
    pop = li.groupBy("item").agg(F.count(F.lit(1)).alias("pc"))
    tot = li.agg(F.count(F.lit(1)).alias("n_events"))
    catalog = pop.agg(F.count(F.lit(1)).alias("n_catalog"))
    recs = _recs(spark, sf_dir)
    nov = (
        recs.join(pop.withColumnRenamed("item", "b"), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                -F.log2(F.col("pc").cast("double") / F.col("n_events")) * 1e9
            )
            .cast("long")
            .alias("nb"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_recs"),
            F.sum("nb").alias("nov_sum_nano"),
        )
    )
    cov = recs.select(F.col("b")).distinct().agg(
        F.count(F.lit(1)).alias("n_recommended")
    )
    return (
        nov.crossJoin(cov)
        .crossJoin(catalog)
        .select(
            F.col("n_recs").cast("long").alias("n_recs"),
            F.col("n_recommended").cast("long").alias("n_recommended"),
            F.col("n_catalog").cast("long").alias("n_catalog"),
            F.expr(
                "cast(n_recommended * 1000 div n_catalog as bigint)"
            ).alias("coverage_milli"),
            F.expr("cast(nov_sum_nano div n_recs as bigint)").alias(
                "novelty_nano"
            ),
        )
    )


_COV_SQL = f"""
WITH pop AS (
    SELECT (l_partkey % {REC_CAT})::BIGINT AS item, count(*)::BIGINT AS pc
    FROM lineitem GROUP BY 1
),
tot AS (SELECT sum(pc)::BIGINT AS n_events FROM pop),
cat AS (SELECT count(*)::BIGINT AS n_catalog FROM pop),
recs AS ({_RECS_SQL}),
nov AS (
    SELECT count(*)::BIGINT AS n_recs,
           sum(CAST(round(-log2(p.pc::DOUBLE / (SELECT n_events FROM tot))
                          * 1e9) AS BIGINT))::BIGINT AS nov_sum_nano
    FROM recs r JOIN pop p ON p.item = r.b
),
cov AS (SELECT count(DISTINCT b)::BIGINT AS n_recommended FROM recs)
SELECT n.n_recs, c.n_recommended, k.n_catalog,
       (c.n_recommended * 1000 // k.n_catalog)::BIGINT AS coverage_milli,
       (n.nov_sum_nano // n.n_recs)::BIGINT AS novelty_nano
FROM nov n CROSS JOIN cov c CROSS JOIN cat k
"""


def q_rec_exposure_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of recommendation exposure over the catalog
    (module doc): one row."""
    li = table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % REC_CAT).cast("long").alias("item")
    )
    catalog = li.distinct()
    recs = _recs(spark, sf_dir)
    expo = recs.groupBy(F.col("b").alias("item")).agg(
        F.count(F.lit(1)).alias("e")
    )
    full = catalog.join(expo, "item", "left").select(
        "item", F.coalesce("e", F.lit(0)).cast("long").alias("e")
    )
    w = Window.orderBy(F.asc("e"), F.asc("item"))
    ranked = full.withColumn("r", F.row_number().over(w))
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("e").alias("se"),
        F.sum(F.col("r") * F.col("e")).alias("sre"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_catalog"),
        F.col("se").cast("long").alias("total_exposure"),
        F.expr(
            "cast((2 * sre - (n + 1) * se) * 1000 div (n * se) as bigint)"
        ).alias("gini_milli"),
    )


_GINI_SQL = f"""
WITH cat AS (
    SELECT DISTINCT (l_partkey % {REC_CAT})::BIGINT AS item FROM lineitem
),
recs AS ({_RECS_SQL}),
expo AS (SELECT b AS item, count(*)::BIGINT AS e FROM recs GROUP BY b),
full_ AS (
    SELECT c.item, coalesce(x.e, 0)::BIGINT AS e
    FROM cat c LEFT JOIN expo x USING (item)
),
ranked AS (
    SELECT *, row_number() OVER (ORDER BY e ASC, item ASC) AS r FROM full_
)
SELECT count(*)::BIGINT AS n_catalog,
       sum(e)::BIGINT AS total_exposure,
       ((2 * sum(r * e) - (count(*) + 1) * sum(e)) * 1000
        // (count(*) * sum(e)))::BIGINT AS gini_milli
FROM ranked
"""


QUERIES = {
    "rec_coverage": q_rec_coverage,
    "rec_exposure_gini": q_rec_exposure_gini,
}

ORACLES = {
    "rec_coverage": _COV_SQL,
    "rec_exposure_gini": _GINI_SQL,
}
