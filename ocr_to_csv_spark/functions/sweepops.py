"""Interval-algebra surface, batch 50: sweep-line operators — total
self-overlap duration per user and per-day peak concurrency. The
classic +1/−1 boundary-point technique: explode each interval into two
signed points, one ordered running sum per PARTITION, measure segments
between consecutive points.

Scale design (100 TB):
- The sweep is inherently sequential IN TIME but the partitions make
  it parallel: ``interval_overlap`` sweeps per user (state = one
  running int per user partition), ``peak_concurrency`` per calendar
  day. No global ordered window anywhere — the 100 TB failure mode of
  naive sweep-line SQL. A day's boundary points always fit a
  partition; for hotter timelines partition by hour and clip at
  boundaries the same way.
- Intervals are synthesized as [unix_timestamp(ts), +round(value))
  — event duration in whole seconds from the value column (the
  established unix_timestamp == DuckDB floor(epoch()) parity —
  both TRUNCATE sub-second fractions, where epoch()::BIGINT would round); exact
  BIGINT seconds, tie-break ends-before-starts (half-open intervals) via
  (t, delta) ordering.
- ``peak_concurrency`` counts an interval in its START day only (docs:
  durations ≲ 6 min ≪ 1 day, and the oracle applies the identical
  clip, so the compare is exact).

Reference parity: no interval layer in the reference; extends the
gaps-and-islands family (``rle_events``, ``active_streak``) and the
interval JOIN (``relational.q_interval_join``) with interval MEASURE
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import table


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed boundary points of per-event intervals: (user_id, day,
    t ms, delta ±1)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.unix_timestamp("ts").cast("long").alias("t0"),
        (F.unix_timestamp("ts").cast("long")
         + F.round(F.col("value")).cast("long")).alias("t1"),
    )
    starts = ev.select("user_id", "day", F.col("t0").alias("t"),
                       F.lit(1).alias("delta"))
    ends = ev.select("user_id", "day", F.col("t1").alias("t"),
                     F.lit(-1).alias("delta"))
    return starts.unionByName(ends)


def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: total seconds covered by ≥2 of their own event
    intervals simultaneously (self-overlap — the double-booked time a
    capacity audit charges)."""
    pts = _points(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("t", "delta")
    seg = pts.select(
        "user_id",
        F.sum("delta").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cov"),
        (F.lead("t").over(w) - F.col("t")).alias("seg_s"),
    )
    return seg.groupBy("user_id").agg(
        F.sum(
            F.when((F.col("cov") >= 2) & F.col("seg_s").isNotNull(),
                   F.col("seg_s")).otherwise(0)
        ).alias("overlap_s")
    )


_OVERLAP_SQL = """
WITH ev AS (
    SELECT user_id, floor(epoch(ts))::BIGINT AS t0,
           floor(epoch(ts))::BIGINT + round(value)::BIGINT AS t1
    FROM events
),
pts AS (
    SELECT user_id, t0 AS t, 1 AS delta FROM ev
    UNION ALL
    SELECT user_id, t1 AS t, -1 AS delta FROM ev
),
seg AS (
    SELECT user_id,
           sum(delta) OVER (PARTITION BY user_id ORDER BY t, delta
                            ROWS UNBOUNDED PRECEDING) AS cov,
           lead(t) OVER (PARTITION BY user_id ORDER BY t, delta) - t
               AS seg_s
    FROM pts
)
SELECT user_id,
       sum(CASE WHEN cov >= 2 AND seg_s IS NOT NULL
                THEN seg_s ELSE 0 END)::BIGINT AS overlap_s
FROM seg GROUP BY user_id
"""


def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per calendar day: maximum number of simultaneously-open event
    intervals (intervals attributed to their start day) and the
    earliest second the peak is reached."""
    pts = _points(spark, sf_dir)
    w = Window.partitionBy("day").orderBy("t", "delta")
    cov = pts.select(
        "day", "t",
        F.sum("delta").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cov"),
    )
    return cov.groupBy("day").agg(
        F.max("cov").alias("peak"),
        F.min_by("t", F.struct((-F.col("cov")).alias("nc"),
                               F.col("t").alias("t"))).alias("first_peak_s"),
    )


_PEAK_SQL = """
WITH ev AS (
    SELECT strftime(ts, '%Y-%m-%d') AS day, floor(epoch(ts))::BIGINT AS t0,
           floor(epoch(ts))::BIGINT + round(value)::BIGINT AS t1
    FROM events
),
pts AS (
    SELECT day, t0 AS t, 1 AS delta FROM ev
    UNION ALL
    SELECT day, t1 AS t, -1 AS delta FROM ev
),
cov AS (
    SELECT day, t,
           sum(delta) OVER (PARTITION BY day ORDER BY t, delta
                            ROWS UNBOUNDED PRECEDING) AS cov
    FROM pts
),
sel AS (
    SELECT day, t, cov, max(cov) OVER (PARTITION BY day) AS mx FROM cov
)
SELECT day, mx::BIGINT AS peak,
       min(CASE WHEN cov = mx THEN t END)::BIGINT AS first_peak_s
FROM sel GROUP BY day, mx
"""


QUERIES = {
    "interval_overlap": q_interval_overlap,
    "peak_concurrency": q_peak_concurrency,
}

ORACLES = {
    "interval_overlap": _OVERLAP_SQL,
    "peak_concurrency": _PEAK_SQL,
}
