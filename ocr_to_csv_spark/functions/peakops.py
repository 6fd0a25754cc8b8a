"""Signal shape readouts, batch 111: peak prominence over the daily
event series and maximum drawdown over per-user net flow — the two
"how big was the spike / the slump" primitives behind alerting and
account-health dashboards.

Scale design (100 TB):
- ``peak_prominence``: the scipy ``find_peaks``+``peak_prominences``
  semantics made exact-integer: per type the zero-filled daily series
  (the gap_fill spine idiom: sequence + explode + left join confined
  to each type's span — never a types × calendar cross) collapses to
  ONE calendar-bounded array; peaks (strictly above both neighbours)
  and their prominences (height above the higher of the two key
  saddles, window bounded by the nearest strictly-higher day per side,
  array end if none) are pure array expressions — the O(span²) inner
  scans are confined to a ≤64-element array inside one row. Emits one
  row per peak, all int64.
- ``max_drawdown``: per user, signed net flow (purchases credit,
  errors debit — integer cents), cumulative sum over the (ts,
  event_id) total order, running peak, and the maximum peak-to-valley
  drop — three window expressions inside the user partition, nothing
  global. The finance-standard slump metric applied to account
  health.

Reference parity: no time-series layer in the reference; extends the
anomaly family (mad_outliers, seasonal_outliers, cusum_drift,
changepoint) with the magnitude-of-extremum readouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import table


def _filled_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(typ, d0, xs): zero-filled daily counts over each type's span."""
    e = table(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts").cast("long") / 86400).cast("long")
    daily = e.groupBy(F.col("event_type").alias("typ"), day.alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    span = daily.groupBy("typ").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = span.select("typ", "lo", F.explode(F.sequence("lo", "hi")).alias("day"))
    j = spine.join(daily, ["typ", "day"], "left").select(
        "typ", "lo", "day", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt")
    )
    xs = F.transform(
        F.sort_array(F.collect_list(F.struct("day", "cnt"))),
        lambda s: s["cnt"],
    )
    return j.groupBy("typ", F.col("lo").alias("d0")).agg(xs.alias("xs"))


_FILLED_SQL = """
    SELECT typ, lo AS d0, list(cnt ORDER BY day) AS xs FROM (
        SELECT s.typ, s.lo, s.day, COALESCE(d.cnt, 0)::BIGINT AS cnt
        FROM (
            SELECT typ, lo, unnest(generate_series(lo, hi)) AS day FROM (
                SELECT typ, min(day) AS lo, max(day) AS hi FROM (
                    SELECT event_type AS typ,
                           CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
                    FROM events
                ) GROUP BY typ
            )
        ) s LEFT JOIN (
            SELECT event_type AS typ,
                   CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                   count(*)::BIGINT AS cnt
            FROM events GROUP BY 1, 2
        ) d ON d.typ = s.typ AND d.day = s.day
    ) GROUP BY typ, lo
"""


def q_peak_prominence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per strict local peak: (typ, day, cnt, prominence)."""
    s = _filled_series(spark, sf_dir)
    xs = F.col("xs")
    n = F.size(xs)

    def at(i):
        return F.get(xs, (i - 1).cast("int"))  # 1-based helper

    idx = F.sequence(F.lit(2).cast("long"), (n - 1).cast("long"))

    def prom(i):
        v = at(i)
        js = F.sequence(F.lit(1).cast("long"), n.cast("long"))
        higher_left = F.array_max(
            F.transform(
                js,
                lambda j: F.when((j < i) & (at(j) > v), j).otherwise(
                    F.lit(0).cast("long")
                ),
            )
        )
        higher_right = F.array_min(
            F.transform(
                js,
                lambda j: F.when((j > i) & (at(j) > v), j).otherwise(
                    (n + 1).cast("long")
                ),
            )
        )
        lmin = F.array_min(
            F.transform(
                js,
                lambda j: F.when(
                    (j >= higher_left + 1) & (j < i), at(j)
                ).otherwise(v),
            )
        )
        rmin = F.array_min(
            F.transform(
                js,
                lambda j: F.when(
                    (j > i) & (j <= higher_right - 1), at(j)
                ).otherwise(v),
            )
        )
        return v - F.greatest(lmin, rmin)

    peaks = F.filter(
        idx, lambda i: (at(i) > at(i - 1)) & (at(i) > at(i + 1))
    )
    rows = s.select(
        "typ",
        "d0",
        F.explode(
            F.transform(
                peaks,
                lambda i: F.struct(
                    i.alias("pos"), at(i).alias("cnt"), prom(i).alias("prom")
                ),
            )
        ).alias("p"),
    )
    return rows.select(
        "typ",
        (F.col("d0") + F.col("p.pos") - 1).cast("long").alias("day"),
        F.col("p.cnt").cast("long").alias("cnt"),
        F.col("p.prom").cast("long").alias("prominence"),
    ).orderBy("typ", "day")


_PEAK_SQL = f"""
WITH s AS ({_FILLED_SQL}),
x AS (
    SELECT typ, d0, CAST(i AS BIGINT) AS pos,
           xs[CAST(i AS BIGINT)] AS v, len(xs)::BIGINT AS n
    FROM s, LATERAL (SELECT unnest(generate_series(1, len(xs))) AS i)
),
peaks AS (
    SELECT typ, d0, pos, v, n FROM (
        SELECT typ, d0, pos, v, n,
               lag(v) OVER (PARTITION BY typ ORDER BY pos) AS pv,
               lead(v) OVER (PARTITION BY typ ORDER BY pos) AS nv
        FROM x
    ) WHERE pv IS NOT NULL AND nv IS NOT NULL AND v > pv AND v > nv
),
bounds AS (
    SELECT p.typ, p.d0, p.pos, p.v, p.n,
           COALESCE(max(b.pos) FILTER (b.pos < p.pos AND b.v > p.v), 0)
               AS l_bound,
           COALESCE(min(b.pos) FILTER (b.pos > p.pos AND b.v > p.v),
                    p.n + 1) AS r_bound
    FROM peaks p JOIN x b ON b.typ = p.typ
    GROUP BY p.typ, p.d0, p.pos, p.v, p.n
),
saddles AS (
    SELECT bo.typ, bo.d0, bo.pos, bo.v,
           COALESCE(min(b.v) FILTER (b.pos > bo.l_bound
                                     AND b.pos < bo.pos), bo.v) AS lmin,
           COALESCE(min(b.v) FILTER (b.pos > bo.pos
                                     AND b.pos < bo.r_bound), bo.v) AS rmin
    FROM bounds bo JOIN x b ON b.typ = bo.typ
    GROUP BY bo.typ, bo.d0, bo.pos, bo.v, bo.l_bound, bo.r_bound
)
SELECT typ, (d0 + pos - 1)::BIGINT AS day, v::BIGINT AS cnt,
       (v - greatest(lmin, rmin))::BIGINT AS prominence
FROM saddles
ORDER BY typ, day
"""


FLOW_SIGN = {"purchase": 1, "error": -1}  # others carry 0


def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: peak cents, final cents, max peak-to-valley drawdown
    of the signed cumulative flow (module doc)."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    sign = (
        F.when(F.col("event_type") == "purchase", 1)
        .when(F.col("event_type") == "error", -1)
        .otherwise(0)
    )
    flow = (F.round(F.col("value") * 100).cast("long") * sign).alias("flow")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = F.sum("flow").over(w)
    base = e.select("user_id", "ts", "event_id", flow).withColumn("cum", cum)
    runmax = F.max("cum").over(w)
    dd = base.withColumn("dd", runmax - F.col("cum"))
    return (
        dd.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("cum").alias("peak_cents"),
            F.max(F.col("dd")).alias("max_drawdown_cents"),
        )
        .join(
            dd.groupBy("user_id").agg(
                F.max(F.struct(F.col("ts"), F.col("event_id"), F.col("cum"))).alias("m")
            ).select("user_id", F.col("m.cum").alias("final_cents")),
            "user_id",
        )
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("peak_cents").cast("long").alias("peak_cents"),
            F.col("final_cents").cast("long").alias("final_cents"),
            F.col("max_drawdown_cents").cast("long").alias(
                "max_drawdown_cents"
            ),
        )
        .orderBy("user_id")
    )


_DD_SQL = """
WITH f AS (
    SELECT user_id, ts, event_id,
           (CAST(round(value * 100) AS BIGINT)
            * CASE event_type WHEN 'purchase' THEN 1
                              WHEN 'error' THEN -1 ELSE 0 END) AS flow
    FROM events WHERE user_id IS NOT NULL
),
c AS (
    SELECT user_id, ts, event_id,
           CAST(sum(flow) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS BIGINT) AS cum
    FROM f
),
d AS (
    SELECT user_id, ts, event_id, cum,
           max(cum) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) - cum AS dd
    FROM c
)
SELECT user_id::BIGINT AS user_id,
       count(*)::BIGINT AS n_events,
       max(cum)::BIGINT AS peak_cents,
       max_by(cum, floor(epoch(ts))::BIGINT * 1048576 + event_id)::BIGINT AS final_cents,
       max(dd)::BIGINT AS max_drawdown_cents
FROM d
GROUP BY user_id
ORDER BY user_id
"""


QUERIES = {
    "peak_prominence": q_peak_prominence,
    "max_drawdown": q_max_drawdown,
}

ORACLES = {
    "peak_prominence": _PEAK_SQL,
    "max_drawdown": _DD_SQL,
}
