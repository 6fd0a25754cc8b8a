"""Sequential experimentation, batch 91: Wald's SPRT early-stopping
decision and the Wald–Wolfowitz runs test — the sequential /
nonparametric side of the experimentation family (ab_test, cuped,
changepoint, mann_kendall).

Scale design (100 TB):
- ``sprt_decision``: the sequential probability ratio test that lets
  an A/B readout STOP EARLY: per arm, daily Bernoulli trials (event →
  purchase?) accumulate the log-likelihood ratio
  llr += k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)); cross A = ln((1−β)/α)
  → accept H1, cross B = ln(β/(1−α)) → accept H0. All coefficients
  are INTEGER MILLI-NAT literals (the viterbi device), so the whole
  scan-order-dependent recurrence is an exact int64 fold over the
  day-sorted daily aggregates — one keyed shuffle to day grain, one
  arm-keyed fold; the FLAT array accumulator [decided, decision, day,
  llr] sidesteps the oracle engine's struct-accumulator fold bug
  (measured in batch 89).
- ``runs_test``: randomness check on each arm's daily
  conversion-rate sequence — sign s_d = [5·k ≥ n] (exact integer
  threshold, rate ≥ 0.2), runs counted by one lag window; emitted as
  exact integers (R, n1, n2) plus E[R] = 1 + 2n1n2/(n1+n2) as an
  exact (num, den) rational — a drifting or autocorrelated metric
  shows too few runs vs E[R].

Reference parity: no experimentation layer in the reference; these
are the guardrails run before trusting the ab_test/cuped readouts.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import table

MILLI = 10**6
P0, P1 = 0.15, 0.25  # H0 / H1 conversion rates
ALPHA = BETA = 0.05
L1 = round(math.log(P1 / P0) * MILLI)  # per-success llr increment
L0 = round(math.log((1 - P1) / (1 - P0)) * MILLI)  # per-failure
A_BOUND = round(math.log((1 - BETA) / ALPHA) * MILLI)  # accept H1
B_BOUND = round(math.log(BETA / (1 - ALPHA)) * MILLI)  # accept H0


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    day = F.floor(F.unix_timestamp("ts").cast("long") / 86400).cast("long")
    return e.groupBy(
        (F.col("user_id") % 2).alias("arm"), day.alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("event_type") == "purchase").cast("long")
        ).alias("k"),
    )


_DAILY_SQL = """
    SELECT user_id % 2 AS arm,
           CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
           count(*)::BIGINT AS n,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               ::BIGINT AS k
    FROM events WHERE user_id IS NOT NULL
    GROUP BY 1, 2
"""


def q_sprt_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per arm: SPRT outcome over the day-ordered trial stream —
    (arm, n_days, decided, decision, decision_day, final_llr);
    decision 1 = accept H1 (llr ≥ A), 2 = accept H0 (llr ≤ B),
    0 = undecided at horizon. Exact int64 milli-nats."""
    d = _daily(spark, sf_dir)
    per_arm = d.groupBy("arm").agg(
        F.sort_array(F.collect_list(F.struct("day", "n", "k"))).alias("ds"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    zero = F.lit(0).cast("long")
    init = F.array(zero, zero, F.lit(-1).cast("long"), zero)

    def step(acc, x):
        decided = F.element_at(acc, 1)
        llr = F.element_at(acc, 4) + x["k"] * F.lit(L1).cast("long") \
            + (x["n"] - x["k"]) * F.lit(L0).cast("long")
        hit_a = llr >= F.lit(A_BOUND).cast("long")
        hit_b = llr <= F.lit(B_BOUND).cast("long")
        upd = F.array(
            F.when(hit_a | hit_b, F.lit(1)).otherwise(F.lit(0)).cast("long"),
            F.when(hit_a, F.lit(1)).when(hit_b, F.lit(2))
            .otherwise(F.lit(0)).cast("long"),
            F.when(hit_a | hit_b, x["day"]).otherwise(F.lit(-1)).cast("long"),
            llr.cast("long"),
        )
        return F.when(decided == 1, acc).otherwise(upd)

    fin = F.aggregate(F.col("ds"), init, step)
    return per_arm.select(
        "arm", "n_days",
        F.element_at(fin, 1).alias("decided"),
        F.element_at(fin, 2).alias("decision"),
        F.element_at(fin, 3).alias("decision_day"),
        F.element_at(fin, 4).alias("final_llr"),
    )


_SPRT_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
g AS (
    SELECT arm, list_sort(list([day, n, k])) AS ds,
           count(*)::BIGINT AS n_days
    FROM daily GROUP BY arm
),
fold AS (
    SELECT arm, n_days,
           list_reduce(
               list_prepend(CAST([[0, 0, -1, 0]] AS BIGINT[][]),
                            list_transform(ds, x -> [CAST(x AS BIGINT[])])),
               (acc, it) -> CASE WHEN acc[1][1] = 1 THEN acc ELSE [
                   [CASE WHEN acc[1][4] + it[1][3] * {L1}
                              + (it[1][2] - it[1][3]) * {L0} >= {A_BOUND}
                          OR acc[1][4] + it[1][3] * {L1}
                              + (it[1][2] - it[1][3]) * {L0} <= {B_BOUND}
                         THEN 1 ELSE 0 END,
                    CASE WHEN acc[1][4] + it[1][3] * {L1}
                              + (it[1][2] - it[1][3]) * {L0} >= {A_BOUND}
                         THEN 1
                         WHEN acc[1][4] + it[1][3] * {L1}
                              + (it[1][2] - it[1][3]) * {L0} <= {B_BOUND}
                         THEN 2 ELSE 0 END,
                    CASE WHEN acc[1][4] + it[1][3] * {L1}
                              + (it[1][2] - it[1][3]) * {L0} >= {A_BOUND}
                          OR acc[1][4] + it[1][3] * {L1}
                              + (it[1][2] - it[1][3]) * {L0} <= {B_BOUND}
                         THEN it[1][1] ELSE -1 END,
                    acc[1][4] + it[1][3] * {L1}
                        + (it[1][2] - it[1][3]) * {L0}]
               ] END
           )[1] AS fin
    FROM g
)
SELECT arm, n_days, fin[1] AS decided, fin[2] AS decision,
       fin[3] AS decision_day, fin[4] AS final_llr
FROM fold
"""


def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per arm: Wald–Wolfowitz runs over the day-ordered sign sequence
    s_d = [5k ≥ n] — (arm, n_days, r_runs, n1, n2, er_num, er_den)."""
    d = _daily(spark, sf_dir)
    s = d.select(
        "arm", "day", "n", "k",
        (5 * F.col("k") >= F.col("n")).cast("long").alias("s"),
    )
    w = Window.partitionBy("arm").orderBy("day")
    flips = s.select(
        "arm", "s",
        F.when(
            F.lag("s").over(w).isNull() | (F.lag("s").over(w) != F.col("s")),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("new_run"),
    )
    agg = flips.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("new_run").alias("r_runs"),
        F.sum("s").alias("n1"),
        F.sum(1 - F.col("s")).alias("n2"),
    )
    return agg.select(
        "arm", "n_days", "r_runs", "n1", "n2",
        (F.col("n1") + F.col("n2") + 2 * F.col("n1") * F.col("n2"))
        .alias("er_num"),
        (F.col("n1") + F.col("n2")).alias("er_den"),
    )


_RUNS_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
s AS (
    SELECT arm, day,
           CASE WHEN 5 * k >= n THEN 1 ELSE 0 END AS s
    FROM daily
),
flips AS (
    SELECT arm, s,
           CASE WHEN lag(s) OVER (PARTITION BY arm ORDER BY day) IS NULL
                  OR lag(s) OVER (PARTITION BY arm ORDER BY day) <> s
                THEN 1 ELSE 0 END AS new_run
    FROM s
)
SELECT arm, count(*)::BIGINT AS n_days,
       sum(new_run)::BIGINT AS r_runs,
       sum(s)::BIGINT AS n1, sum(1 - s)::BIGINT AS n2,
       (sum(s) + sum(1 - s) + 2 * sum(s) * sum(1 - s))::BIGINT AS er_num,
       (sum(s) + sum(1 - s))::BIGINT AS er_den
FROM flips GROUP BY arm
"""


QUERIES = {
    "sprt_decision": q_sprt_decision,
    "runs_test": q_runs_test,
}

ORACLES = {
    "sprt_decision": _SPRT_SQL,
    "runs_test": _RUNS_SQL,
}
