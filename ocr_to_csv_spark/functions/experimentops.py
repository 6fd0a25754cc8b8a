"""Experimentation + drift analytics, batch 80: exact binary-
segmentation changepoint on the daily series and CUPED variance-
reduced A/B readout.

Scale design (100 TB):
- ``changepoint``: the binary-segmentation inner step — the split day
  minimizing SSE_left + SSE_right of the daily event-value series,
  SSE = Σv² − (Σv)²/n. Exactly the ``best_split`` plan shape
  (mlops.py): one day-grain groupBy (calendar-sized), ONE ordered
  window of cumulative (n, Σv, Σv²), per-candidate cost from int64
  cumulants with a fixed two-division IEEE expression — identical
  bit-for-bit in both engines (every input int64, each division
  exactly-rounded once, one add) — argmin with day tie-break. At
  100 TB the day table is still calendar-sized; recursing on segments
  gives full binary segmentation with the same per-level cost.
- ``cuped`` (Deng et al. 2013): the covariate-adjusted experiment
  readout every platform runs — adjusted metric Y − θ(X − E[X]) with
  θ = cov(X,Y)/var(X) from PRE-experiment covariates. Unit = customer,
  Y = Σ floor(order cents/1000) (fixed integer scaling, documented as
  part of the metric so every term stays int64 at sf0.1 and beyond:
  θ numerator N·Σxy − ΣxΣy ≤ 1.1e18), X = floor(acctbal cents/100)
  (explicit floor() in BOTH engines — DuckDB's integer ``//``
  truncates toward zero while Spark's floor() floors, a measured
  negative-balance mismatch). One customer-keyed join + one map-side
  moment aggregate + a single-row broadcast of (θ_num, θ_den, Σx, N);
  per-arm adjusted means assembled from int64 moments with one fixed
  IEEE expression rounded 9dp (wilson_rank discipline).

Reference parity: no experimentation layer in the reference; completes
the A/B family (ab_test, diff_in_diff, bootstrap_ci) with the
variance-reduction step and the drift family (cusum_drift,
seasonal_outliers) with the segmentation statistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .statsops import TS_FROM, TS_TO
from .util import table


def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single split of the daily series by total SSE (module
    docstring). Emits the split day, both segments' exact integer
    (n, Σv) and the IEEE cost."""
    ev = table(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit(TS_FROM).cast("timestamp"))
        & (F.col("ts") < F.lit(TS_TO).cast("timestamp"))
    )
    day = F.datediff(F.col("ts").cast("date"), F.lit("1995-01-01").cast("date"))
    cents = F.round(F.col("value") * 100).cast("long")
    daily = ev.groupBy(day.alias("d")).agg(F.sum(cents).alias("v"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = daily.select(
        "d",
        F.count(F.lit(1)).over(w).alias("n_l"),
        F.sum("v").over(w).alias("s_l"),
        F.sum(F.col("v") * F.col("v")).over(w).alias("q_l"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("v").over(wall).alias("s"),
        F.sum(F.col("v") * F.col("v")).over(wall).alias("q"),
    )
    n_l, s_l, q_l = F.col("n_l"), F.col("s_l"), F.col("q_l")
    n_r = F.col("n") - n_l
    s_r = F.col("s") - s_l
    q_r = F.col("q") - q_l
    cost = (
        q_l.cast("double") - (s_l * s_l) / n_l.cast("double")
    ) + (q_r.cast("double") - (s_r * s_r) / n_r.cast("double"))
    scored = cum.filter(n_r > 0).select(
        F.col("d").alias("split_d"),
        n_l.alias("n_l"), s_l.alias("sum_l"),
        n_r.alias("n_r"), s_r.alias("sum_r"),
        cost.alias("cost"),
    )
    return scored.orderBy("cost", "split_d").limit(1)


_CP_SQL = f"""
WITH daily AS (
    SELECT date_diff('day', DATE '1995-01-01', ts::DATE) AS d,
           sum(CAST(round(value * 100) AS BIGINT)) AS v
    FROM events
    WHERE ts >= TIMESTAMP '{TS_FROM}' AND ts < TIMESTAMP '{TS_TO}'
    GROUP BY 1
),
cum AS (
    SELECT d,
           count(*) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_l,
           sum(v) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_l,
           sum(v * v) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS q_l,
           count(*) OVER () AS n, sum(v) OVER () AS s,
           sum(v * v) OVER () AS q
    FROM daily
),
scored AS (
    SELECT d AS split_d, n_l, s_l AS sum_l, n - n_l AS n_r,
           s - s_l AS sum_r,
           (CAST(q_l AS DOUBLE) - (s_l * s_l) / CAST(n_l AS DOUBLE))
           + (CAST(q - q_l AS DOUBLE)
              - ((s - s_l) * (s - s_l)) / CAST(n - n_l AS DOUBLE)) AS cost
    FROM cum WHERE n - n_l > 0
)
SELECT split_d::BIGINT AS split_d, n_l::BIGINT AS n_l,
       sum_l::BIGINT AS sum_l, n_r::BIGINT AS n_r,
       sum_r::BIGINT AS sum_r, cost
FROM scored ORDER BY cost, split_d LIMIT 1
"""


def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted per-arm means (module docstring): arm = custkey
    parity; Y = Σ floor(order cents/1000); X = floor(acctbal cents/100);
    θ as an exact int64 rational; adjusted mean rounded 9dp."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        (F.col("c_custkey") % 2).alias("arm"),
        F.floor(
            F.round(F.col("c_acctbal") * 100).cast("long") / 100
        ).cast("long").alias("x"),
    )
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.floor(
            F.round(F.col("o_totalprice") * 100).cast("long") / 1000
        ).cast("long").alias("yo"),
    )
    y = o.groupBy("k").agg(F.sum("yo").alias("y"))
    u = c.join(y, "k")  # units = customers with ≥1 order
    tot = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).select(
        "n", "sx",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("t_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("t_den"),
    )
    arms = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_a"),
        F.sum("y").alias("sy_a"),
        F.sum("x").alias("sx_a"),
    )
    j = arms.crossJoin(F.broadcast(tot))
    adj = (
        F.col("sy_a").cast("double") / F.col("n_a").cast("double")
        - (F.col("t_num").cast("double") / F.col("t_den").cast("double"))
        * (
            F.col("sx_a").cast("double") / F.col("n_a").cast("double")
            - F.col("sx").cast("double") / F.col("n").cast("double")
        )
    )
    return j.select(
        "arm", "n_a", "sy_a", "sx_a", "t_num", "t_den",
        F.round(adj, 9).alias("adj_mean"),
    )


_CUPED_SQL = """
WITH c AS (
    SELECT c_custkey AS k, c_custkey % 2 AS arm,
           CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT) / 100.0)
               AS BIGINT) AS x
    FROM customer
),
y AS (
    SELECT o_custkey AS k,
           sum(CAST(floor(CAST(round(o_totalprice * 100) AS BIGINT)
                          / 1000.0) AS BIGINT)) AS y
    FROM orders GROUP BY 1
),
u AS (SELECT c.arm, c.x, y.y FROM c JOIN y USING (k)),
tot AS (
    SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
           (count(*) * sum(x*y) - sum(x) * sum(y))::BIGINT AS t_num,
           (count(*) * sum(x*x) - sum(x) * sum(x))::BIGINT AS t_den
    FROM u
),
arms AS (
    SELECT arm, count(*)::BIGINT AS n_a, sum(y)::BIGINT AS sy_a,
           sum(x)::BIGINT AS sx_a
    FROM u GROUP BY arm
)
SELECT arm::BIGINT AS arm, n_a, sy_a, sx_a, t_num, t_den,
       round(
           CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
           - (CAST(t_num AS DOUBLE) / CAST(t_den AS DOUBLE))
             * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)),
           9) AS adj_mean
FROM arms, tot
"""


QUERIES = {
    "changepoint": q_changepoint,
    "cuped": q_cuped,
}

ORACLES = {
    "changepoint": _CP_SQL,
    "cuped": _CUPED_SQL,
}
