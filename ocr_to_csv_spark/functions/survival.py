"""Survival/causal surface, batch 55: the Kaplan–Meier risk table
(time-to-churn with right-censoring — the retention analysis grown-up
form of ``retention_cohorts``) and an exact-integer
difference-in-differences estimate (the pre/post × treat/control
causal baseline next to ``ab_test``'s single-split comparison).

Scale design (100 TB):
- ``kaplan_meier`` reduces events to one (first, last) pair per user
  (one partial-agg groupBy), durations to a DAY-grain count table
  (bounded by the observation window, not user count), and the
  at-risk counts to one reverse prefix-sum window over that bounded
  table. The emitted table (t_days, n_risk, d_churn, c_censored) is
  all-integer — Ŝ(t) = Π(1 − d/n) is derivable by the reader, keeping
  floats out of the engine compare. Censoring: users whose last event
  is within HORIZON days of the corpus end are censored, not churned.
- ``diff_in_diff`` is ONE aggregate with eight conditional sums (no
  join, no shuffle beyond the final combine): the 2×2 cell means are
  combined into an exact rational did_num/did_den over the common
  denominator (int64-safe while Σcents·n² < 9.2·10¹⁸ — holds through
  sf10; beyond that, scale cents down or use decimal).

Reference parity: no survival/causal layer in the reference; extends
``engagement.py`` (retention_cohorts, dau_mau) and ``ab_test``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import table

HORIZON_DAYS = 3  # last activity within this tail ⇒ censored
DID_SPLIT_DAY = "2024-01-16"  # post-period start (corpus is Jan 2024)


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier risk table over user lifetimes (days between first
    and last event), right-censored at the corpus horizon."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").cast("long").alias("sec")
    )
    span = ev.groupBy("user_id").agg(
        F.min("sec").alias("first_sec"), F.max("sec").alias("last_sec")
    )
    gmax = ev.agg(F.max("sec").alias("gmax_sec"))
    lives = span.crossJoin(F.broadcast(gmax)).select(
        ((F.col("last_sec") - F.col("first_sec")) / 86400)
        .cast("long").alias("t_days"),
        F.when(
            F.col("last_sec") <= F.col("gmax_sec") - HORIZON_DAYS * 86400,
            1,
        ).otherwise(0).alias("churned"),
    )
    per_t = lives.groupBy("t_days").agg(
        F.sum("churned").alias("d_churn"),
        F.sum(1 - F.col("churned")).alias("c_censored"),
        F.count("*").alias("n_at_t"),
    )
    w = Window.orderBy(F.desc("t_days")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_t.select(
        "t_days",
        F.sum("n_at_t").over(w).alias("n_risk"),
        "d_churn", "c_censored",
    )


_KM_SQL = f"""
WITH ev AS (
    SELECT user_id, floor(epoch(ts))::BIGINT AS sec FROM events
),
span AS (
    SELECT user_id, min(sec) AS first_sec, max(sec) AS last_sec
    FROM ev GROUP BY user_id
),
g AS (SELECT max(sec) AS gmax_sec FROM ev),
lives AS (
    SELECT ((last_sec - first_sec) // 86400)::BIGINT AS t_days,
           CASE WHEN last_sec <= gmax_sec - {HORIZON_DAYS} * 86400
                THEN 1 ELSE 0 END AS churned
    FROM span, g
),
per_t AS (
    SELECT t_days, sum(churned) AS d_churn,
           sum(1 - churned) AS c_censored, count(*) AS n_at_t
    FROM lives GROUP BY t_days
)
SELECT t_days,
       sum(n_at_t) OVER (ORDER BY t_days DESC
                         ROWS UNBOUNDED PRECEDING)::BIGINT AS n_risk,
       d_churn::BIGINT AS d_churn, c_censored::BIGINT AS c_censored
FROM per_t
"""


def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-rational difference-in-differences of event value (cents)
    across treat (user parity) × post (calendar split), as the exact
    integer-milli contrast of per-cell means."""
    ev = table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2 == 0).cast("int").alias("treat"),
        (F.col("ts") >= F.lit(DID_SPLIT_DAY)).cast("int").alias("post"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )

    def cell(t: int, p: int, what):
        cond = (F.col("treat") == t) & (F.col("post") == p)
        return F.sum(F.when(cond, what).otherwise(0))

    agg = ev.agg(
        *[cell(t, p, F.col("cents")).alias(f"s{t}{p}")
          for t in (0, 1) for p in (0, 1)],
        *[cell(t, p, F.lit(1)).alias(f"n{t}{p}")
          for t in (0, 1) for p in (0, 1)],
    )
    # Per-cell exact milli-means, then the DiD contrast on those: the
    # old cross-multiplied rational (s·n·n·n) overflows int64 once cell
    # sums pass ~1e8 cents (caught by the sf0.1 gate, r4). s·1000 stays
    # < 2^63 up to $9.2e12 per cell; values are non-negative so Spark
    # `div` (truncate) == DuckDB `//` (floor) per cell.
    mean = {
        f"m{t}{p}": F.expr(f"(s{t}{p} * 1000) div n{t}{p}")
        for t in (0, 1) for p in (0, 1)
    }
    return agg.select(
        "s00", "s01", "s10", "s11", "n00", "n01", "n10", "n11",
        (
            mean["m11"] - mean["m10"] - mean["m01"] + mean["m00"]
        ).alias("did_milli"),
    )


_DID_SQL = f"""
WITH ev AS (
    SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treat,
           CASE WHEN ts >= TIMESTAMP '{DID_SPLIT_DAY} 00:00:00'
                THEN 1 ELSE 0 END AS post,
           round(value * 100)::BIGINT AS cents
    FROM events
),
a AS (
    SELECT
      sum(CASE WHEN treat=0 AND post=0 THEN cents ELSE 0 END) AS s00,
      sum(CASE WHEN treat=0 AND post=1 THEN cents ELSE 0 END) AS s01,
      sum(CASE WHEN treat=1 AND post=0 THEN cents ELSE 0 END) AS s10,
      sum(CASE WHEN treat=1 AND post=1 THEN cents ELSE 0 END) AS s11,
      sum(CASE WHEN treat=0 AND post=0 THEN 1 ELSE 0 END) AS n00,
      sum(CASE WHEN treat=0 AND post=1 THEN 1 ELSE 0 END) AS n01,
      sum(CASE WHEN treat=1 AND post=0 THEN 1 ELSE 0 END) AS n10,
      sum(CASE WHEN treat=1 AND post=1 THEN 1 ELSE 0 END) AS n11
    FROM ev
)
SELECT s00::BIGINT AS s00, s01::BIGINT AS s01, s10::BIGINT AS s10,
       s11::BIGINT AS s11, n00::BIGINT AS n00, n01::BIGINT AS n01,
       n10::BIGINT AS n10, n11::BIGINT AS n11,
       ((s11 * 1000) // n11 - (s10 * 1000) // n10
        - (s01 * 1000) // n01 + (s00 * 1000) // n00)::BIGINT AS did_milli
FROM a
"""


QUERIES = {
    "kaplan_meier": q_kaplan_meier,
    "diff_in_diff": q_diff_in_diff,
}

ORACLES = {
    "kaplan_meier": _KM_SQL,
    "diff_in_diff": _DID_SQL,
}
