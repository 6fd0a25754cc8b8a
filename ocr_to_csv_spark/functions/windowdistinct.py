"""Windowed-distinct surface, batch 52: trailing-window distinct
counts and the new-vs-returning split — the daily-active-user family
beyond ``dau_mau`` (calendar-month grain) and ``retention_cohorts``
(cohort grain).

Scale design (100 TB):
- SQL engines express rolling reach as ``COUNT(DISTINCT) OVER (RANGE N
  PRECEDING)``; Spark has no distinct window aggregate, and emulating
  one with a giant collect_set window would hold per-day user sets in
  executor memory. ``sliding_distinct`` uses the CONTRIBUTION trick:
  dedup to (day, user) first (the only big shuffle), explode each pair
  to the ≤7 window-days it contributes to (a constant map-side fan-out
  — same shape as the 3×3 cell explode in geo_grid_join), then one
  exact count-distinct per window-day. Shuffle volume O(active-pairs·7),
  state O(1).
- ``new_vs_returning`` is two hash aggregations: per-user first day,
  then per-day counts split on day == first_day. The first-day table
  is user-sized; at 10⁹ users it is still a thin two-column shuffle.

Reference parity: no engagement layer in the reference; completes the
``dau_mau`` / ``retention_cohorts`` / ``active_streak`` family in
``engagement.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

WINDOW_DAYS = 7


def q_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per observed day: distinct users active within the trailing
    7 days (rolling reach)."""
    ev = table(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("DAY", "ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    contrib = du.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.date_add(F.col("day"), WINDOW_DAYS - 1),
            )
        ).alias("wday"),
    )
    return (
        contrib.join(days, contrib.wday == days.day)
        .groupBy("wday")
        .agg(F.countDistinct("user_id").alias("users_7d"))
        .select(F.date_format("wday", "yyyy-MM-dd").alias("day"), "users_7d")
    )


_SLIDING_SQL = f"""
WITH du AS (
    SELECT DISTINCT date_trunc('day', ts)::DATE AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM du)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       count(DISTINCT u.user_id)::BIGINT AS users_7d
FROM days d
JOIN du u ON u.day <= d.day AND u.day >= d.day - {WINDOW_DAYS - 1}
GROUP BY d.day
"""


def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: active users split into first-ever-seen vs returning."""
    ev = table(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("DAY", "ts").cast("date").alias("day"), "user_id"
    ).distinct()
    first = du.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        du.join(first, "user_id")
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
            .alias("new_users"),
            F.sum(F.when(F.col("day") != F.col("first_day"), 1).otherwise(0))
            .alias("returning_users"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "new_users", "returning_users",
        )
    )


_NVR_SQL = """
WITH du AS (
    SELECT DISTINCT date_trunc('day', ts)::DATE AS day, user_id FROM events
),
first AS (SELECT user_id, min(day) AS first_day FROM du GROUP BY user_id)
SELECT strftime(du.day, '%Y-%m-%d') AS day,
       sum(CASE WHEN du.day = first.first_day THEN 1 ELSE 0 END)::BIGINT
           AS new_users,
       sum(CASE WHEN du.day <> first.first_day THEN 1 ELSE 0 END)::BIGINT
           AS returning_users
FROM du JOIN first USING (user_id)
GROUP BY du.day
"""


QUERIES = {
    "sliding_distinct": q_sliding_distinct,
    "new_vs_returning": q_new_vs_returning,
}

ORACLES = {
    "sliding_distinct": _SLIDING_SQL,
    "new_vs_returning": _NVR_SQL,
}
