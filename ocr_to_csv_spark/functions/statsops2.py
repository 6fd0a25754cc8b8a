"""Statistical surface, batch 45: two-sample Kolmogorov–Smirnov
distribution test, classical seasonal decomposition, and the chi²
independence contingency table — the drift/seasonality/association
trio a corpus-monitoring pipeline runs between training snapshots.

Scale design (100 TB):
- ``ks_test`` never sorts raw rows: values bucket to $100 cells first
  (groupBy → cardinality bounded by the PRICE RANGE, not row count),
  and the one ordered prefix-sum window runs over that bounded
  aggregate — the ``mode_per_group`` precedent. The statistic is the
  exact KS of the bucketed distribution, returned as the integer
  rational max|F1·n2 − F2·n1| / (n1·n2) so no float crosses engines.
  (Raw-value exactness at scale = KLL sketch or a two-pass partition
  prefix-sum; the bucketed test is what drift monitors actually run.)
- ``seasonal_decompose`` aggregates to ONE ROW PER DAY before any
  window; the centered 7-day trend window and the weekday seasonal
  means are all over that day-count-bounded series. Classical
  x = trend + seasonal + residual, kept exact by scaling: detrended
  d = 7·cents − Σ₇cents, seasonal numerator Σd per weekday, residual
  d·cnt − Σd — integers end to end.
- ``chi2_cells`` is three partial-agg groupBys over a |segments|×
  |priorities| table (25 cells) joined broadcast; per-cell deviation
  (obs·N − rowtot·coltot)² stays in int64 up to ~3·10⁹ rows per cell
  pair — beyond that, scale the counts (the monitor thresholds on
  relative deviation anyway).

Reference parity: no stats layer in the reference (rad10/OCR-to-CSV);
complements ``statsops.py`` (OLS/Spearman/bootstrap) and
``temporal.py`` (chi²-vs-uniform hour seasonality) with cross-sample
and cross-category tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import table

KS_SEG_A = "BUILDING"
KS_SEG_B = "MACHINERY"
KS_BUCKET = 100.0  # dollars per KS value cell


def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS over order totals of two customer segments.
    D = d_num / (n1·n2), exact integers."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(KS_SEG_A, KS_SEG_B)
    )
    j = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select(
        F.floor(F.col("o_totalprice") / KS_BUCKET).cast("long").alias("val"),
        F.when(F.col("c_mktsegment") == KS_SEG_A, 1).otherwise(0).alias("a"),
        F.when(F.col("c_mktsegment") == KS_SEG_B, 1).otherwise(0).alias("b"),
    )
    agg = j.groupBy("val").agg(
        F.sum("a").alias("c1"), F.sum("b").alias("c2")
    )
    w_cum = Window.orderBy("val").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("val").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = agg.select(
        F.sum("c1").over(w_cum).alias("f1"),
        F.sum("c2").over(w_cum).alias("f2"),
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
    )
    return cum.agg(
        F.max(F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")))
        .alias("d_num"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
    )


_KS_SQL = f"""
WITH j AS (
    SELECT floor(o_totalprice / {KS_BUCKET})::BIGINT AS val,
           CASE WHEN c_mktsegment = '{KS_SEG_A}' THEN 1 ELSE 0 END AS a,
           CASE WHEN c_mktsegment = '{KS_SEG_B}' THEN 1 ELSE 0 END AS b
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment IN ('{KS_SEG_A}', '{KS_SEG_B}')
),
agg AS (SELECT val, sum(a) AS c1, sum(b) AS c2 FROM j GROUP BY val),
cum AS (
    SELECT sum(c1) OVER (ORDER BY val) AS f1,
           sum(c2) OVER (ORDER BY val) AS f2,
           sum(c1) OVER () AS n1,
           sum(c2) OVER () AS n2
    FROM agg
)
SELECT max(abs(f1 * n2 - f2 * n1))::BIGINT AS d_num,
       max(n1)::BIGINT AS n1, max(n2)::BIGINT AS n2
FROM cum
"""


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical decomposition of daily order revenue: centered 7-day
    trend, weekday seasonal means, scaled-integer residuals. Only days
    with a full 7-day trend window are emitted."""
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_format(F.col("o_orderdate"), "yyyy-MM-dd").alias("day"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    t = daily.select(
        "day", "dow", "cents",
        F.sum("cents").over(w7).alias("trend_sum7"),
        F.count("*").over(w7).alias("n7"),
    ).filter(F.col("n7") == 7).drop("n7")
    t = t.withColumn(
        "detr7", F.col("cents") * 7 - F.col("trend_sum7")
    )
    season = t.groupBy("dow").agg(
        F.sum("detr7").alias("s_num"), F.count("*").alias("s_cnt")
    )
    return (
        t.join(F.broadcast(season), "dow")
        .select(
            "day", "dow", "cents", "trend_sum7", "detr7", "s_num", "s_cnt",
            (F.col("detr7") * F.col("s_cnt") - F.col("s_num"))
            .alias("resid_num"),
        )
    )


_SEASONAL_SQL = """
WITH daily AS (
    SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
           dayofweek(o_orderdate) AS dow,
           sum(round(o_totalprice * 100)::BIGINT) AS cents
    FROM orders GROUP BY 1, 2
),
t AS (
    SELECT day, dow, cents,
           sum(cents) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                            AND 3 FOLLOWING) AS trend_sum7,
           count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                          AND 3 FOLLOWING) AS n7
    FROM daily
),
d AS (
    SELECT day, dow, cents, trend_sum7,
           cents * 7 - trend_sum7 AS detr7
    FROM t WHERE n7 = 7
),
season AS (
    SELECT dow, sum(detr7) AS s_num, count(*) AS s_cnt FROM d GROUP BY dow
)
SELECT d.day, d.dow::BIGINT AS dow, d.cents::BIGINT AS cents,
       d.trend_sum7::BIGINT AS trend_sum7, d.detr7::BIGINT AS detr7,
       season.s_num::BIGINT AS s_num, season.s_cnt::BIGINT AS s_cnt,
       (d.detr7 * season.s_cnt - season.s_num)::BIGINT AS resid_num
FROM d JOIN season USING (dow)
"""


def q_chi2_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi² independence contingency table: market segment × order
    priority, per-cell exact deviation (obs·N − rowtot·coltot)²."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    j = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_orderpriority").alias("prio"),
    )
    obs = j.groupBy("seg", "prio").agg(F.count("*").alias("obs"))
    rows = obs.groupBy("seg").agg(F.sum("obs").alias("row_tot"))
    cols = obs.groupBy("prio").agg(F.sum("obs").alias("col_tot"))
    tot = obs.agg(F.sum("obs").alias("n_total"))
    return (
        obs.join(F.broadcast(rows), "seg")
        .join(F.broadcast(cols), "prio")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "dev",
            F.col("obs") * F.col("n_total")
            - F.col("row_tot") * F.col("col_tot"),
        )
        .select(
            "seg", "prio", "obs", "row_tot", "col_tot", "n_total",
            (F.col("dev") * F.col("dev")).alias("dev_sq"),
        )
    )


_CHI2_SQL = """
WITH j AS (
    SELECT c_mktsegment AS seg, o_orderpriority AS prio
    FROM orders JOIN customer ON o_custkey = c_custkey
),
obs AS (SELECT seg, prio, count(*) AS obs FROM j GROUP BY seg, prio),
r AS (SELECT seg, sum(obs) AS row_tot FROM obs GROUP BY seg),
c AS (SELECT prio, sum(obs) AS col_tot FROM obs GROUP BY prio),
n AS (SELECT sum(obs) AS n_total FROM obs)
SELECT obs.seg, obs.prio, obs.obs::BIGINT AS obs,
       r.row_tot::BIGINT AS row_tot, c.col_tot::BIGINT AS col_tot,
       n.n_total::BIGINT AS n_total,
       ((obs.obs * n.n_total - r.row_tot * c.col_tot)
        * (obs.obs * n.n_total - r.row_tot * c.col_tot))::BIGINT AS dev_sq
FROM obs JOIN r USING (seg) JOIN c USING (prio) CROSS JOIN n
"""


QUERIES = {
    "ks_test": q_ks_test,
    "seasonal_decompose": q_seasonal_decompose,
    "chi2_cells": q_chi2_cells,
}

ORACLES = {
    "ks_test": _KS_SQL,
    "seasonal_decompose": _SEASONAL_SQL,
    "chi2_cells": _CHI2_SQL,
}
