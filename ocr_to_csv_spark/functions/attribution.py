"""Attribution analytics, batch 21: last-touch attribution,
time-to-convert latency, and market-basket pair mining — the
conversion-analytics shapes over events and orders.

Scale design (100 TB):
- ``last_touch`` assigns each purchase the latest PRECEDING non-purchase
  event of the same user via one per-user window (max_by over the
  bounded preceding frame is expressed as a lag-style self-ordering:
  the window carries only (ts, type) pairs). One shuffle on user_id;
  no self-join of the raw stream.
- ``time_to_convert`` is two conditional MIN aggregates per user (first
  signup, first purchase-after-signup) — the second is computed from
  the per-user first-signup joined back, keeping everything keyed;
  latency buckets are integer seconds.
- ``basket_pairs`` self-joins lineitem ON ORDERKEY only (order sizes
  are bounded — ≤13 lines in this corpus, ≤7 in TPC-H — so the
  per-order pair fan-out is a small constant, the classic market-basket
  trick; an unbounded-cart system would cap lines per order first).
  Pair counts then aggregate on the (part_a, part_b) key; top pairs via
  TakeOrderedAndProject.

Reference parity: no attribution layer in the reference; extends the
events analytics family (analytics.py funnel / markov).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import table

TOP_BASKETS = 40


def q_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: for each purchase, the type and age
    (integer seconds) of the same user's latest strictly-earlier
    non-purchase event; purchases with no prior touch attribute to
    'direct'."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    sec = F.unix_timestamp("ts").cast("long")
    base = e.select(
        "event_id", "user_id", "event_type", sec.alias("sec")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("sec"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    touch_sec = F.last(
        F.when(F.col("event_type") != "purchase", F.col("sec")),
        ignorenulls=True,
    ).over(w)
    return (
        base.select(
            "event_id",
            "user_id",
            "event_type",
            "sec",
            touch.alias("touch"),
            touch_sec.alias("touch_sec"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.coalesce("touch", F.lit("direct")).alias("channel"),
            F.coalesce(
                F.col("sec") - F.col("touch_sec"), F.lit(-1)
            ).alias("age_s"),
        )
    )


_LAST_TOUCH_SQL = """
    WITH base AS (
        SELECT event_id, user_id, event_type,
               floor(epoch(ts))::BIGINT AS sec
        FROM events WHERE user_id IS NOT NULL
    ),
    att AS (
        SELECT event_id, user_id, event_type, sec,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS) OVER w
                   AS touch,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN sec END IGNORE NULLS) OVER w
                   AS touch_sec
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY sec ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id,
           coalesce(touch, 'direct') AS channel,
           coalesce(sec - touch_sec, -1)::BIGINT AS age_s
    FROM att WHERE event_type = 'purchase'
"""


def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: first signup time, first purchase AT-OR-AFTER it, and
    the latency in integer seconds (users without both: excluded)."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    sec = F.unix_timestamp("ts").cast("long")
    base = e.select("user_id", "event_type", sec.alias("sec"))
    first_signup = (
        base.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("sec").alias("signup_sec"))
    )
    conv = (
        base.filter(F.col("event_type") == "purchase")
        .join(first_signup, "user_id")
        .filter(F.col("sec") >= F.col("signup_sec"))
        .groupBy("user_id")
        .agg(
            F.min("sec").alias("purchase_sec"),
            F.max("signup_sec").alias("signup_sec"),
        )
    )
    return conv.select(
        "user_id",
        "signup_sec",
        "purchase_sec",
        (F.col("purchase_sec") - F.col("signup_sec")).alias("latency_s"),
    )


_TIME_TO_CONVERT_SQL = """
    WITH base AS (
        SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS sec
        FROM events WHERE user_id IS NOT NULL
    ),
    fs AS (
        SELECT user_id, min(sec)::BIGINT AS signup_sec
        FROM base WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT b.user_id, max(signup_sec)::BIGINT AS signup_sec,
           min(b.sec)::BIGINT AS purchase_sec,
           (min(b.sec) - max(signup_sec))::BIGINT AS latency_s
    FROM base b JOIN fs ON b.user_id = fs.user_id
    WHERE b.event_type = 'purchase' AND b.sec >= fs.signup_sec
    GROUP BY b.user_id
"""


def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: co-purchased part pairs (a < b)
    across orders, top TOP_BASKETS by (count desc, a, b)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
    )
    return pairs.orderBy(
        F.desc("n_orders"), F.asc("part_a"), F.asc("part_b")
    ).limit(TOP_BASKETS)


_BASKET_SQL = f"""
    WITH li AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*)::BIGINT AS n_orders
    FROM li a JOIN li b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    ORDER BY n_orders DESC, part_a ASC, part_b ASC
    LIMIT {TOP_BASKETS}
"""


QUERIES = {
    "last_touch": q_last_touch,
    "time_to_convert": q_time_to_convert,
    "basket_pairs": q_basket_pairs,
}

ORACLES = {
    "last_touch": _LAST_TOUCH_SQL,
    "time_to_convert": _TIME_TO_CONVERT_SQL,
    "basket_pairs": _BASKET_SQL,
}
