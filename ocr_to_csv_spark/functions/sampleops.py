"""Survey-sampling operators, batch 94: Neyman optimal stratified
allocation and Lincoln–Petersen capture-recapture — the two classical
estimators behind sample-budget planning and coverage estimation for a
crawl/curation pipeline (how many docs to label per stratum; how many
distinct users/pages exist beyond what two probes both saw).

Scale design (100 TB):
- ``neyman_alloc``: per market-segment stratum, exact int64 moments
  (n, Σv, Σv²) from ONE keyed aggregate; the Neyman weight
  w_h = N_h·σ_h is computed as floor(1000·sqrt(N_h·Q_h − S_h²)) — the
  inner value is an exact int64, sqrt is IEEE-correctly-rounded, and
  the floor freezes it into an exact integer weight BEFORE the
  apportionment, so the largest-remainder split of the label budget
  (the crawl_budget device: base = ⌊B·w/W⌋, leftovers by remainder
  rank) is all-integer and sums EXACTLY to the budget.
- ``capture_recapture``: distinct active users of two deterministic
  probe windows (day-parity halves); Lincoln–Petersen N̂ = n1·n2/m
  emitted as the exact (num, den) rational plus the Chapman
  bias-corrected variant ((n1+1)(n2+1)/(m+1) − 1, also exact ints).
  Two distinct-aggregates + one 1-row cross (allowlisted tier).

Reference parity: no sampling layer in the reference; these plan the
labeling/QA budgets that the curation selectors (mix_sample,
stratified_sample, knapsack_select) then spend.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import table

LABEL_BUDGET = 1000  # labels to allocate across strata
W_SCALE = 1000  # weight fixed-point scale


def q_neyman_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per segment: exact moments, integer Neyman weight, and the
    largest-remainder allocation of LABEL_BUDGET (sums exactly)."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("v"),
    )
    m = c.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"),
    )
    # n²·var = n·q − s² (exact int64); σ·n = sqrt of it
    w = F.floor(
        F.lit(float(W_SCALE))
        * F.sqrt((F.col("n") * F.col("q") - F.col("s") * F.col("s"))
                 .cast("double"))
    ).cast("long")
    weighted = m.withColumn("w", w)
    tot = Window.partitionBy()
    shares = weighted.select(
        "seg", "n", "w",
        F.sum("w").over(tot).alias("w_tot"),
    ).select(
        "seg", "n", "w",
        F.expr(f"{LABEL_BUDGET} * w div w_tot").alias("base"),
        F.expr(f"({LABEL_BUDGET} * w) % w_tot").alias("rem_num"),
    )
    rk_w = Window.orderBy(F.desc("rem_num"), F.asc("seg"))
    leftover = F.lit(LABEL_BUDGET) - F.sum("base").over(tot)
    ranked = shares.select(
        "seg", "n", "w", "base", "rem_num",
        F.row_number().over(rk_w).cast("long").alias("rk"),
        leftover.alias("leftover"),
    )
    return ranked.select(
        "seg", "n", "w", "base",
        (F.col("base") + (F.col("rk") <= F.col("leftover")).cast("long"))
        .alias("alloc"),
    )


_NEYMAN_SQL = f"""
WITH m AS (
    SELECT c_mktsegment AS seg, count(*)::BIGINT AS n,
           sum(CAST(round(c_acctbal * 100) AS BIGINT))::BIGINT AS s,
           sum(CAST(round(c_acctbal * 100) AS BIGINT)
               * CAST(round(c_acctbal * 100) AS BIGINT))::BIGINT AS q
    FROM customer GROUP BY 1
),
weighted AS (
    SELECT seg, n,
           CAST(floor({float(W_SCALE)}
                      * sqrt(CAST(n * q - s * s AS DOUBLE))) AS BIGINT) AS w
    FROM m
),
shares AS (
    SELECT seg, n, w, sum(w) OVER () AS w_tot FROM weighted
),
ranked AS (
    SELECT seg, n, w,
           {LABEL_BUDGET} * w // w_tot AS base,
           ({LABEL_BUDGET} * w) % w_tot AS rem_num,
           CAST(row_number() OVER (ORDER BY ({LABEL_BUDGET} * w) % w_tot DESC,
                                   seg ASC) AS BIGINT) AS rk,
           {LABEL_BUDGET} - sum({LABEL_BUDGET} * w // w_tot) OVER ()
               AS leftover
    FROM shares
)
SELECT seg, n, w, base::BIGINT AS base,
       (base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)::BIGINT AS alloc
FROM ranked
"""


def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lincoln–Petersen + Chapman estimates of the active-user
    population from the day-parity probe windows (exact rationals)."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    day = F.floor(F.unix_timestamp("ts").cast("long") / 86400).cast("long")
    u = e.select(F.col("user_id").alias("uid"), (day % 2).alias("half"))
    h0 = u.filter(F.col("half") == 0).select("uid").distinct()
    h1 = u.filter(F.col("half") == 1).select("uid").distinct()
    n1 = h0.agg(F.count(F.lit(1)).alias("n1"))
    n2 = h1.agg(F.count(F.lit(1)).alias("n2"))
    m = h0.join(h1, "uid").agg(F.count(F.lit(1)).alias("m"))
    j = n1.crossJoin(F.broadcast(n2)).crossJoin(F.broadcast(m))
    return j.select(
        "n1", "n2", "m",
        (F.col("n1") * F.col("n2")).alias("lp_num"),
        F.col("m").alias("lp_den"),
        ((F.col("n1") + 1) * (F.col("n2") + 1)).alias("chapman_num"),
        (F.col("m") + 1).alias("chapman_den"),
    )


_CAPTURE_SQL = """
WITH u AS (
    SELECT user_id AS uid,
           CAST(floor(epoch(ts) / 86400) AS BIGINT) % 2 AS half
    FROM events WHERE user_id IS NOT NULL
),
h0 AS (SELECT DISTINCT uid FROM u WHERE half = 0),
h1 AS (SELECT DISTINCT uid FROM u WHERE half = 1),
agg AS (
    SELECT (SELECT count(*)::BIGINT FROM h0) AS n1,
           (SELECT count(*)::BIGINT FROM h1) AS n2,
           (SELECT count(*)::BIGINT FROM h0 JOIN h1 USING (uid)) AS m
)
SELECT n1, n2, m,
       (n1 * n2)::BIGINT AS lp_num, m AS lp_den,
       ((n1 + 1) * (n2 + 1))::BIGINT AS chapman_num,
       (m + 1)::BIGINT AS chapman_den
FROM agg
"""


QUERIES = {
    "neyman_alloc": q_neyman_alloc,
    "capture_recapture": q_capture_recapture,
}

ORACLES = {
    "neyman_alloc": _NEYMAN_SQL,
    "capture_recapture": _CAPTURE_SQL,
}
