"""ML feature-audit operators, batch 93: weight-of-evidence / IV
feature binning and the population stability index — the two
credit-scoring-era metrics every production feature pipeline still
runs (predictive-power screen before training; distribution-drift
monitor after deployment). Completes the monitoring family
(source_drift, cusum_drift, calibration_bins, gains_table).

Scale design (100 TB):
- ``woe_iv``: per fixed-width price bin (equi-WIDTH, not equi-depth —
  bin ids are pure map-side integer math, no order statistics), exact
  integer (n_good, n_bad) from ONE keyed aggregate over the
  order⋈returned-flag join; WOE uses +1/+K Laplace smoothing so empty
  cells never hit ln(0) — the ratio is an exact int64 rational and the
  single ln() is LEAF-ROUNDED 9dp (the naive_bayes discipline). IV is
  the sorted fold over the ≤K bin terms. Labels: an order is "bad"
  when any of its lines came back with returnflag 'R' (semi-join,
  never a fan-out).
- ``psi_drift``: event-type distribution of day-parity halves
  (deterministic split); per-type smoothed shares are exact rationals,
  term = (p1−p2)·ln(p1/p2) with the ln leaf-rounded 9dp, PSI = sorted
  fold. One groupBy + one 1-row totals cross (allowlisted tier).

Reference parity: no ML-audit layer in the reference; these gate the
classifier features (quality_classifier, target_encode) the way a
model-risk team would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

BIN_W = 25_000  # price-bin width (dollars)
N_BINS_K = 16  # smoothing K (≈ number of occupied bins)
RND = 9


def q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per price bin: exact (n_good, n_bad), smoothed WOE (9dp) and the
    bin's IV term; plus the bin count so IV totals stay auditable."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    bad_orders = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
        .distinct()
    )
    labeled = o.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") / BIN_W).cast("long").alias("bin"),
    ).join(
        bad_orders.withColumn("is_bad", F.lit(1)), "o_orderkey", "left"
    ).select(
        "bin", F.coalesce("is_bad", F.lit(0)).alias("is_bad")
    )
    bins = labeled.groupBy("bin").agg(
        F.sum(1 - F.col("is_bad")).alias("n_good"),
        F.sum("is_bad").alias("n_bad"),
    )
    tot = bins.agg(
        F.sum("n_good").alias("g_tot"), F.sum("n_bad").alias("b_tot")
    )
    k = F.lit(N_BINS_K).cast("long")
    woe = F.round(
        F.log(
            ((F.col("n_good") + 1) * (F.col("b_tot") + k)).cast("double")
            / ((F.col("n_bad") + 1) * (F.col("g_tot") + k)).cast("double")
        ),
        RND,
    )
    share_diff = (
        (F.col("n_good") + 1).cast("double")
        / (F.col("g_tot") + k).cast("double")
        - (F.col("n_bad") + 1).cast("double")
        / (F.col("b_tot") + k).cast("double")
    )
    return (
        bins.crossJoin(F.broadcast(tot))
        .select(
            "bin", "n_good", "n_bad",
            woe.alias("woe"),
            F.round(share_diff * woe, RND).alias("iv_term"),
        )
    )


_WOE_SQL = f"""
WITH bad AS (
    SELECT DISTINCT l_orderkey AS o_orderkey
    FROM lineitem WHERE l_returnflag = 'R'
),
labeled AS (
    SELECT CAST(floor(o_totalprice / {BIN_W}) AS BIGINT) AS bin,
           CASE WHEN bad.o_orderkey IS NULL THEN 0 ELSE 1 END AS is_bad
    FROM orders LEFT JOIN bad USING (o_orderkey)
),
bins AS (
    SELECT bin, sum(1 - is_bad)::BIGINT AS n_good,
           sum(is_bad)::BIGINT AS n_bad
    FROM labeled GROUP BY bin
),
tot AS (SELECT sum(n_good)::BIGINT AS g_tot, sum(n_bad)::BIGINT AS b_tot
        FROM bins)
SELECT bin, n_good, n_bad,
       round(ln(CAST((n_good + 1) * (b_tot + {N_BINS_K}) AS DOUBLE)
                / CAST((n_bad + 1) * (g_tot + {N_BINS_K}) AS DOUBLE)),
             {RND}) AS woe,
       round((CAST(n_good + 1 AS DOUBLE) / CAST(g_tot + {N_BINS_K} AS DOUBLE)
              - CAST(n_bad + 1 AS DOUBLE) / CAST(b_tot + {N_BINS_K} AS DOUBLE))
             * round(ln(CAST((n_good + 1) * (b_tot + {N_BINS_K}) AS DOUBLE)
                        / CAST((n_bad + 1) * (g_tot + {N_BINS_K}) AS DOUBLE)),
                     {RND}), {RND}) AS iv_term
FROM bins CROSS JOIN tot
"""


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI between the day-parity halves' event-type distributions:
    one row (n_types, psi) + per-half totals."""
    e = table(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts").cast("long") / 86400).cast("long")
    half = (day % 2).alias("half")
    cnt = e.groupBy(F.col("event_type").alias("typ"), half).agg(
        F.count(F.lit(1)).alias("c")
    )
    piv = cnt.groupBy("typ").agg(
        F.sum(F.when(F.col("half") == 0, F.col("c")).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("half") == 1, F.col("c")).otherwise(0)).alias("c1"),
    )
    tot = piv.agg(
        F.sum("c0").alias("t0"), F.sum("c1").alias("t1"),
        F.count(F.lit(1)).alias("n_types"),
    )
    j = piv.crossJoin(F.broadcast(tot))
    p0 = (F.col("c0") + 1).cast("double") / (
        F.col("t0") + F.col("n_types")
    ).cast("double")
    p1 = (F.col("c1") + 1).cast("double") / (
        F.col("t1") + F.col("n_types")
    ).cast("double")
    lr = F.round(
        F.log(
            ((F.col("c0") + 1) * (F.col("t1") + F.col("n_types"))).cast(
                "double"
            )
            / ((F.col("c1") + 1) * (F.col("t0") + F.col("n_types"))).cast(
                "double"
            )
        ),
        RND,
    )
    terms = j.select(
        "typ", "n_types", "t0", "t1",
        F.round((p0 - p1) * lr, RND).alias("term"),
    )
    return terms.groupBy("n_types", "t0", "t1").agg(
        F.aggregate(
            F.sort_array(F.collect_list("term")),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("psi"),
    )


_PSI_SQL = f"""
WITH cnt AS (
    SELECT event_type AS typ,
           CAST(floor(epoch(ts) / 86400) AS BIGINT) % 2 AS half,
           count(*)::BIGINT AS c
    FROM events GROUP BY 1, 2
),
piv AS (
    SELECT typ,
           sum(CASE WHEN half = 0 THEN c ELSE 0 END)::BIGINT AS c0,
           sum(CASE WHEN half = 1 THEN c ELSE 0 END)::BIGINT AS c1
    FROM cnt GROUP BY typ
),
tot AS (SELECT sum(c0)::BIGINT AS t0, sum(c1)::BIGINT AS t1,
               count(*)::BIGINT AS n_types FROM piv),
terms AS (
    SELECT n_types, t0, t1,
           round((CAST(c0 + 1 AS DOUBLE) / CAST(t0 + n_types AS DOUBLE)
                  - CAST(c1 + 1 AS DOUBLE) / CAST(t1 + n_types AS DOUBLE))
                 * round(ln(CAST((c0 + 1) * (t1 + n_types) AS DOUBLE)
                            / CAST((c1 + 1) * (t0 + n_types) AS DOUBLE)),
                         {RND}), {RND}) AS term
    FROM piv CROSS JOIN tot
)
SELECT n_types, t0, t1,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                list_sort(list(term))),
                   (a, b) -> a + b) AS psi
FROM terms GROUP BY n_types, t0, t1
"""


QUERIES = {
    "woe_iv": q_woe_iv,
    "psi_drift": q_psi_drift,
}

ORACLES = {
    "woe_iv": _WOE_SQL,
    "psi_drift": _PSI_SQL,
}
