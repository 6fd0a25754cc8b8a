"""Engagement analytics, batch 14: RFM segmentation and DAU/MAU
stickiness — the product-analytics shapes run over event streams.

Scale design (100 TB):
- ``rfm`` (recency / frequency / monetary) is ONE user-keyed aggregate;
  monetary sums in exact integer cents (order-independent), recency is
  integer day arithmetic against the corpus max timestamp (a 1-row
  broadcast cross — the documented tiny-build-side exception). Segments
  use FIXED thresholds, not quantiles: a global ntile would funnel every
  user through one window partition, and production quantile cutoffs
  would come from an approx-percentile aggregate, not a sort.
- ``dau_mau`` computes trailing-28-day MAU without a distinct-over-range
  window (which Spark cannot partition) by fanning each DISTINCT
  (day, user) pair out to the ≤28 target days it supports — a bounded
  28× fan-out of the deduplicated day-user table (tiny vs raw events),
  then one (target_day)-keyed distinct count. Stickiness = DAU/MAU is
  one exact division of two integers.

Reference parity: no engagement layer in the reference; extends the
events-table analytics family (``analytics.py``: retention_cohorts,
event_funnel, markov_transitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

# fixed RFM segment cutoffs (days / events / cents)
R_HOT, R_WARM = 2, 7
F_HIGH, F_MID = 80, 60
M_HIGH, M_MID = 400_000, 250_000
MAU_DAYS = 28


def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: one aggregate per user, fixed-threshold letter
    grades, monetary in exact integer cents."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    per = e.groupBy("user_id").agg(
        F.max(F.date_trunc("day", "ts")).alias("last_day"),
        F.count("*").alias("frequency"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("monetary_c"),
    )
    mx = e.agg(F.max(F.date_trunc("day", "ts")).alias("corpus_max_day"))
    j = per.crossJoin(F.broadcast(mx))
    rec = F.datediff(F.col("corpus_max_day"), F.col("last_day"))
    r = (
        F.when(rec <= R_HOT, "R1").when(rec <= R_WARM, "R2").otherwise("R3")
    )
    f = (
        F.when(F.col("frequency") >= F_HIGH, "F1")
        .when(F.col("frequency") >= F_MID, "F2")
        .otherwise("F3")
    )
    m = (
        F.when(F.col("monetary_c") >= M_HIGH, "M1")
        .when(F.col("monetary_c") >= M_MID, "M2")
        .otherwise("M3")
    )
    return j.select(
        "user_id",
        rec.cast("long").alias("recency_days"),
        "frequency",
        (F.col("monetary_c") / 100.0).alias("monetary"),
        F.concat(r, F.lit("-"), f, F.lit("-"), m).alias("segment"),
    )


_RFM_SQL = f"""
    WITH per AS (
        SELECT user_id,
               max(date_trunc('day', ts)) AS last_day,
               count(*) AS frequency,
               sum(CAST(round(value * 100) AS BIGINT)) AS monetary_c
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    mx AS (SELECT max(date_trunc('day', ts)) AS corpus_max_day
           FROM events WHERE user_id IS NOT NULL)
    SELECT user_id,
           date_diff('day', last_day, corpus_max_day)::BIGINT AS recency_days,
           frequency,
           monetary_c / 100.0 AS monetary,
           concat(
               CASE WHEN date_diff('day', last_day, corpus_max_day)
                         <= {R_HOT} THEN 'R1'
                    WHEN date_diff('day', last_day, corpus_max_day)
                         <= {R_WARM} THEN 'R2' ELSE 'R3' END,
               '-',
               CASE WHEN frequency >= {F_HIGH} THEN 'F1'
                    WHEN frequency >= {F_MID} THEN 'F2' ELSE 'F3' END,
               '-',
               CASE WHEN monetary_c >= {M_HIGH} THEN 'M1'
                    WHEN monetary_c >= {M_MID} THEN 'M2' ELSE 'M3' END
           ) AS segment
    FROM per CROSS JOIN mx
"""


def q_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-28-day MAU / stickiness per active day. Each
    distinct (day, user) pair fans out to the target days it supports
    (≤28, a bounded fan-out of the deduplicated pair table), then one
    keyed aggregate counts distinct users per target day; target days
    are kept only where the day itself had activity."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    du = e.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    fan = du.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr(f"INTERVAL {MAU_DAYS - 1} DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("target_day"),
        F.col("day"),
        F.col("user_id"),
    )
    per_target = fan.groupBy("target_day").agg(
        F.countDistinct("user_id").alias("mau"),
        F.countDistinct(
            F.when(F.col("day") == F.col("target_day"), F.col("user_id"))
        ).alias("dau"),
    )
    active_days = du.select(F.col("day").alias("target_day")).distinct()
    return (
        per_target.join(active_days, "target_day")
        .select(
            "target_day",
            "dau",
            "mau",
            (F.col("dau").cast("double") / F.col("mau")).alias("stickiness"),
        )
    )


_DAU_MAU_SQL = f"""
    WITH du AS (
        SELECT DISTINCT date_trunc('day', ts) AS day, user_id
        FROM events WHERE user_id IS NOT NULL
    ),
    fan AS (
        SELECT unnest(generate_series(
                   day, day + INTERVAL {MAU_DAYS - 1} DAY, INTERVAL 1 DAY
               )) AS target_day,
               day, user_id
        FROM du
    ),
    per_target AS (
        SELECT target_day,
               count(DISTINCT user_id) AS mau,
               count(DISTINCT CASE WHEN day = target_day
                                   THEN user_id END) AS dau
        FROM fan GROUP BY target_day
    )
    SELECT target_day, dau, mau, dau::DOUBLE / mau AS stickiness
    FROM per_target
    JOIN (SELECT DISTINCT day AS target_day FROM du) USING (target_day)
"""


QUERIES = {
    "rfm": q_rfm,
    "dau_mau": q_dau_mau,
}

ORACLES = {
    "rfm": _RFM_SQL,
    "dau_mau": _DAU_MAU_SQL,
}
