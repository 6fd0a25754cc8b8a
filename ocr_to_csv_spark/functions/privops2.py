"""Privacy operators, batch 61: t-closeness audit and local-DP
randomized response with the debiased estimator.

Scale design (100 TB):
- ``t_closeness`` (Li et al. 2007): for each quasi-identifier class
  (nation, balance band — the same QI lattice as ``k_anon_audit`` /
  ``l_diversity``) measure the variational distance between the
  class's sensitive-attribute distribution (market segment) and the
  global one: t = ½ Σ_s |p_s - q_s|. Everything is EXACT RATIONAL
  until one final division: numerator Σ_s |cnt_class_s·n_glob -
  cnt_glob_s·n_class| over denominator 2·n_class·n_glob, all int64
  (counts ≤ 2^31 keep the products < 2^62). The dense (class ×
  segment) grid comes from a broadcast cross-join against the
  segment-domain table (|domain| rows, tiny), so missing cells are
  real zeros, not dropped rows; per-class work is one keyed
  aggregation — no window, no global sort. At 10^12 rows this is two
  aggregations plus a broadcast join, shuffling only class-sized
  aggregates.
- ``rand_response`` (Warner 1965 local DP): each order reports its
  binary sensitive bit (priority = 1-URGENT) truthfully with
  probability p = 3/4 and flipped otherwise, the flip decided by a
  DETERMINISTIC hash bit (md5 of the order key, mod 4 — no RNG state,
  reproducible across retries, the ``stratified_sample`` precedent).
  The debiased count estimate for p = 3/4 is T̂ = (4·obs - n)/2,
  emitted as an exact integer numerator plus one IEEE division. The
  true count ships alongside as the audit column. Pure map-side
  expression + one small groupBy — embarrassingly parallel.

Reference parity: no privacy layer in the reference; completes the
measure→transform→mechanism privacy arc (``k_anon_audit``,
``l_diversity``, ``k_anon_generalize``, ``pii_scrub`` → this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import DUCK_HEX32, hex32, table

T_BAND = 200000  # acctbal cents per balance band (matches k_anon_audit scale)
RR_LIE_MOD = 4  # lie when hash % 4 == 0  →  p(truth) = 3/4


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness per QI class (see module docstring)."""
    c = table(spark, sf_dir, "customer")
    band = F.floor(
        F.round(F.col("c_acctbal") * 100).cast("long") / T_BAND
    ).cast("long")
    base = c.select(
        F.col("c_nationkey").cast("long").alias("nation"),
        band.alias("bal_band"),
        F.col("c_mktsegment").alias("seg"),
    )
    cls_cnt = base.groupBy("nation", "bal_band", "seg").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cls_tot = base.groupBy("nation", "bal_band").agg(
        F.count(F.lit(1)).alias("n_class")
    )
    glob = base.groupBy("seg").agg(F.count(F.lit(1)).alias("g_cnt"))
    n_glob = base.agg(F.count(F.lit(1)).alias("n_glob"))
    # dense grid: every class × every segment value (broadcast the
    # domain-sized side), zero-fill missing cells
    grid = cls_tot.crossJoin(F.broadcast(glob.crossJoin(n_glob)))
    dense = grid.join(
        cls_cnt, ["nation", "bal_band", "seg"], "left"
    ).withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    per_class = dense.groupBy("nation", "bal_band", "n_class", "n_glob").agg(
        F.sum(
            F.abs(
                F.col("cnt") * F.col("n_glob")
                - F.col("g_cnt") * F.col("n_class")
            )
        ).alias("t_num")
    )
    return per_class.select(
        "nation",
        "bal_band",
        "n_class",
        "t_num",
        (F.lit(2) * F.col("n_class") * F.col("n_glob")).alias("t_den"),
        (
            F.col("t_num").cast("double")
            / (F.lit(2) * F.col("n_class") * F.col("n_glob")).cast("double")
        ).alias("t"),
    ).orderBy("nation", "bal_band")


_TCLOSE_SQL = f"""
WITH base AS (
    SELECT CAST(c_nationkey AS BIGINT) AS nation,
           CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT)
                      / {T_BAND}.0) AS BIGINT) AS bal_band,
           c_mktsegment AS seg
    FROM customer
),
cls_cnt AS (SELECT nation, bal_band, seg, COUNT(*) AS cnt
            FROM base GROUP BY 1, 2, 3),
cls_tot AS (SELECT nation, bal_band, COUNT(*) AS n_class
            FROM base GROUP BY 1, 2),
gseg AS (SELECT seg, COUNT(*) AS g_cnt FROM base GROUP BY 1),
n AS (SELECT COUNT(*) AS n_glob FROM base),
dense AS (
    SELECT t.nation, t.bal_band, t.n_class, g.seg, g.g_cnt, n.n_glob,
           COALESCE(c.cnt, 0) AS cnt
    FROM cls_tot t CROSS JOIN gseg g CROSS JOIN n
    LEFT JOIN cls_cnt c
      ON c.nation = t.nation AND c.bal_band = t.bal_band AND c.seg = g.seg
)
SELECT nation, bal_band, n_class,
       CAST(SUM(abs(cnt * n_glob - g_cnt * n_class)) AS BIGINT) AS t_num,
       CAST(2 * n_class * n_glob AS BIGINT) AS t_den,
       CAST(SUM(abs(cnt * n_glob - g_cnt * n_class)) AS DOUBLE)
           / CAST(2 * n_class * n_glob AS DOUBLE) AS t
FROM dense
GROUP BY nation, bal_band, n_class, n_glob
ORDER BY nation, bal_band
"""


def q_rand_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner randomized response + debiased estimate per order status."""
    o = table(spark, sf_dir, "orders")
    truth = (F.col("o_orderpriority") == "1-URGENT").cast("long")
    lie = (
        hex32(F.col("o_orderkey").cast("string")) % RR_LIE_MOD == 0
    ).cast("long")
    reported = (truth != lie).cast("long")  # truth XOR lie
    agg = (
        o.select(
            F.col("o_orderstatus").alias("status"),
            truth.alias("truth"),
            reported.alias("reported"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("truth").alias("true_cnt"),
            F.sum("reported").alias("reported_cnt"),
        )
    )
    est_num = F.lit(4) * F.col("reported_cnt") - F.col("n")
    return agg.select(
        "status",
        "n",
        "true_cnt",
        "reported_cnt",
        est_num.alias("est_num"),
        (est_num.cast("double") / F.lit(2.0)).alias("estimate"),
    ).orderBy("status")


_H = DUCK_HEX32.format(x="CAST(o_orderkey AS VARCHAR)")

_RR_SQL = f"""
WITH src AS (
    SELECT o_orderstatus AS status,
           CAST(o_orderpriority = '1-URGENT' AS BIGINT) AS truth,
           CAST(({_H}) % {RR_LIE_MOD} = 0 AS BIGINT) AS lie
    FROM orders
),
agg AS (
    SELECT status, COUNT(*) AS n,
           CAST(SUM(truth) AS BIGINT) AS true_cnt,
           CAST(SUM(CAST(truth <> lie AS BIGINT)) AS BIGINT) AS reported_cnt
    FROM src GROUP BY status
)
SELECT status, n, true_cnt, reported_cnt,
       CAST(4 * reported_cnt - n AS BIGINT) AS est_num,
       CAST(4 * reported_cnt - n AS DOUBLE) / 2.0 AS estimate
FROM agg
ORDER BY status
"""


QUERIES = {
    "t_closeness": q_t_closeness,
    "rand_response": q_rand_response,
}

ORACLES = {
    "t_closeness": _TCLOSE_SQL,
    "rand_response": _RR_SQL,
}
