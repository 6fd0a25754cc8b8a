"""Calendar arithmetic + ML feature prep, batch 73: business-day lag
and leave-one-out target encoding.

Scale design (100 TB):
- ``business_days``: ship lag in BUSINESS days (weekends excluded) per
  order priority — the SLA metric calendar joins usually get wrong.
  Closed form, no calendar table, no join: with day index d counted
  from the Monday anchor 1990-01-01 (every corpus date is later, so
  d ≥ 0 and div/mod agree across engines), the weekday count before d
  is wb(d) = 5·(d div 7) + min(d mod 7, 5); the lag between order and
  ship dates is wb(d_ship) − wb(d_order). All exact integers, pure
  map-side expression; one priority-sized aggregate at the end with
  the mean shipped as an exact (sum, n) rational plus one division.
- ``target_encode``: leave-one-out target encoding of the order
  priority against the order total — the standard way to feed a
  high-cardinality categorical to a model WITHOUT leaking each row's
  own label (the in-repo ``split_leakage_audit`` checks for exactly
  this class of leak). Per row: (group_sum − own) / (group_n − 1) with
  sums in exact cents, shipped as integer numerator/denominator plus
  one IEEE division; singleton groups fall back to the global LOO mean
  (same rational discipline). Plan: one group aggregate joined back on
  the key + a 1-row broadcast for the global fallback — two keyed
  hash joins, no window over the full table.

Reference parity: no feature-prep layer in the reference; extends the
training-data surface (``split_assign``, ``split_leakage_audit``,
``hash_embed``, ``quantile_norm``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

ANCHOR = "1990-01-01"  # a Monday; all corpus dates are later


def _wb(day_col):
    """Weekdays in [anchor, anchor+day): 5 per full week + the partial
    week clipped at 5 (Sat/Sun contribute nothing)."""
    return F.expr(f"5 * ({day_col} div 7)") + F.least(
        F.expr(f"{day_col} % 7"), F.lit(5)
    )


def q_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ship lag in business days per order priority (module doc)."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit(ANCHOR).cast("date")
        ).cast("long").alias("d0"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.lit(ANCHOR).cast("date")
        ).cast("long").alias("d1"),
    )
    lag = (_wb("d1") - _wb("d0")).cast("long")
    agg = j.select(F.col("o_orderpriority").alias("prio"), lag.alias("bd")).groupBy(
        "prio"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bd").alias("bd_sum"),
        F.min("bd").alias("bd_min"),
        F.max("bd").alias("bd_max"),
    )
    return agg.select(
        "prio",
        "n",
        "bd_sum",
        "bd_min",
        "bd_max",
        (F.col("bd_sum").cast("double") / F.col("n").cast("double")).alias(
            "bd_avg"
        ),
    ).orderBy("prio")


_BD_SQL = f"""
WITH j AS (
    SELECT o.o_orderpriority AS prio,
           datediff('day', DATE '{ANCHOR}', CAST(o.o_orderdate AS DATE))
               AS d0,
           datediff('day', DATE '{ANCHOR}', CAST(l.l_shipdate AS DATE))
               AS d1
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
lagd AS (
    SELECT prio,
           (5 * (d1 // 7) + least(d1 % 7, 5))
         - (5 * (d0 // 7) + least(d0 % 7, 5)) AS bd
    FROM j
)
SELECT prio, COUNT(*) AS n,
       CAST(SUM(bd) AS BIGINT) AS bd_sum,
       CAST(MIN(bd) AS BIGINT) AS bd_min,
       CAST(MAX(bd) AS BIGINT) AS bd_max,
       CAST(SUM(bd) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS bd_avg
FROM lagd
GROUP BY prio
ORDER BY prio
"""


def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of order priority vs total cents
    (module doc)."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("prio"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    grp = o.groupBy("prio").agg(
        F.count(F.lit(1)).alias("g_n"), F.sum("cents").alias("g_sum")
    )
    glob = o.agg(
        F.count(F.lit(1)).alias("t_n"), F.sum("cents").alias("t_sum")
    )
    j = o.join(grp, "prio").crossJoin(F.broadcast(glob))
    # LOO within the group; singleton groups fall back to the global
    # leave-one-out mean (t_sum - own) / (t_n - 1)
    num = F.when(
        F.col("g_n") > 1, F.col("g_sum") - F.col("cents")
    ).otherwise(F.col("t_sum") - F.col("cents"))
    den = F.when(F.col("g_n") > 1, F.col("g_n") - 1).otherwise(
        F.col("t_n") - 1
    )
    return j.select(
        "o_orderkey",
        "prio",
        "cents",
        num.alias("enc_num"),
        den.alias("enc_den"),
        (num.cast("double") / den.cast("double")).alias("enc"),
    ).orderBy("o_orderkey")


_TE_SQL = """
WITH o AS (
    SELECT o_orderkey, o_orderpriority AS prio,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
grp AS (SELECT prio, COUNT(*) AS g_n, CAST(SUM(cents) AS BIGINT) AS g_sum
        FROM o GROUP BY prio),
gtot AS (SELECT COUNT(*) AS t_n, CAST(SUM(cents) AS BIGINT) AS t_sum FROM o)
SELECT o.o_orderkey, o.prio, o.cents,
       CAST(CASE WHEN g.g_n > 1 THEN g.g_sum - o.cents
                 ELSE gl.t_sum - o.cents END AS BIGINT) AS enc_num,
       CAST(CASE WHEN g.g_n > 1 THEN g.g_n - 1
                 ELSE gl.t_n - 1 END AS BIGINT) AS enc_den,
       CAST(CASE WHEN g.g_n > 1 THEN g.g_sum - o.cents
                 ELSE gl.t_sum - o.cents END AS DOUBLE)
           / CAST(CASE WHEN g.g_n > 1 THEN g.g_n - 1
                       ELSE gl.t_n - 1 END AS DOUBLE) AS enc
FROM o JOIN grp g USING (prio) CROSS JOIN gtot gl
ORDER BY o.o_orderkey
"""


QUERIES = {
    "business_days": q_business_days,
    "target_encode": q_target_encode,
}

ORACLES = {
    "business_days": _BD_SQL,
    "target_encode": _TE_SQL,
}
