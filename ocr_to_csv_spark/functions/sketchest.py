"""Sketch estimation audits, batch 125: AMS join-size estimation (the
tug-of-war sketch product) audited against the exact join cardinality,
and priority sampling (Duffield–Lund–Thorup) subset-sum estimates
audited against exact group totals — the two estimators a planner and
a billing pipeline trust only after exactly this audit.

Scale design (100 TB):
- ``ams_join_est``: each side keeps J=16 counters Σ ±1 — the sign is
  an md5 bit per (sketch, key), a MAP-SIDE expression exploded J ways
  (bounded fan-out), and each counter is one partial-aggregated keyed
  sum. |A ⋈ B| is estimated by the mean of the J counter products —
  EXACT int64 end-to-end (the estimator is integer-valued by
  construction; only the final floor-mean divides). The exact control
  is the count-join (two keyed counts + one equi-join + one sum),
  which at 10^12 rows is precisely what you can NOT afford to run
  twice — the sketch costs one scan and 16 integers per side.
- ``priority_sample_est``: priorities q = floor(w·2³² / (h+1)) are
  integer, deterministic and engine-shared (hex32); ONE top-(k+1)
  window (WindowGroupLimit) extracts the sample and the threshold
  τ = q_(k+1); subset-sum estimates Σ max(w, τ) per order status are
  sample-bounded metadata; exact controls are one keyed agg. All
  integers — no float crosses engines.

Reference parity: no sketch layer in the reference; completes the
sketch family (ams_f2, cms_freq, hll_distinct, theta_intersect,
quantile_sketch) with the JOIN-size estimator and the sample-based
subset-sum estimator plus their audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import DUCK_HEX32, hex32, table

AMS_J = 16  # independent tug-of-war sketches
PS_K = 64  # priority-sample size
PS_POW = 1 << 32


def _signed(df: DataFrame, key: str) -> DataFrame:
    """Explode J sketch rows per input row with ±1 signs (module doc)."""
    j = F.explode(F.sequence(F.lit(1), F.lit(AMS_J))).alias("j")
    out = df.select(F.col(key).cast("long").alias("k"), j)
    h = hex32(
        F.concat(
            F.lit("ams"),
            F.col("j").cast("string"),
            F.lit("|"),
            F.col("k").cast("string"),
        )
    )
    return out.select(
        "j", F.when(h % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).alias("s")
    )


def q_ams_join_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS estimate vs exact |orders ⋈ lineitem| on orderkey
    (module doc): one row."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem", spread=True)
    sa = _signed(o, "o_orderkey").groupBy("j").agg(F.sum("s").alias("sa"))
    sb = _signed(li, "l_orderkey").groupBy("j").agg(F.sum("s").alias("sb"))
    prods = sa.join(sb, "j").select((F.col("sa") * F.col("sb")).alias("p"))
    est = prods.agg(
        F.sum("p").alias("sum_est"), F.count(F.lit(1)).alias("nj")
    )
    ca = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    cb = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    exact = ca.join(cb, "k").agg(
        F.sum(F.col("ca") * F.col("cb")).alias("exact_join")
    )
    return est.crossJoin(exact).select(
        F.col("sum_est").cast("long").alias("sum_est"),
        F.col("nj").cast("long").alias("n_sketches"),
        F.expr("cast(sum_est div nj as bigint)").alias("est_join"),
        F.col("exact_join").cast("long").alias("exact_join"),
        F.abs(
            F.expr("cast(sum_est div nj as bigint)") - F.col("exact_join")
        ).cast("long").alias("abs_err"),
    )


def _ams_h(key: str) -> str:
    return DUCK_HEX32.format(
        x=f"'ams' || j::VARCHAR || '|' || {key}::VARCHAR"
    )


_AMS_SQL = f"""
WITH ja AS (
    SELECT j, sum(CASE WHEN ({_ams_h('o_orderkey')}) % 2 = 0
                       THEN 1 ELSE -1 END)::BIGINT AS sa
    FROM orders, (SELECT unnest(generate_series(1, {AMS_J})) AS j)
    GROUP BY j
),
jb AS (
    SELECT j, sum(CASE WHEN ({_ams_h('l_orderkey')}) % 2 = 0
                       THEN 1 ELSE -1 END)::BIGINT AS sb
    FROM lineitem, (SELECT unnest(generate_series(1, {AMS_J})) AS j)
    GROUP BY j
),
est AS (
    SELECT sum(sa * sb)::BIGINT AS sum_est, count(*)::BIGINT AS nj
    FROM ja JOIN jb USING (j)
),
exact AS (
    SELECT sum(ca * cb)::BIGINT AS exact_join FROM (
        SELECT o_orderkey AS k, count(*)::BIGINT AS ca FROM orders GROUP BY 1
    ) a JOIN (
        SELECT l_orderkey AS k, count(*)::BIGINT AS cb FROM lineitem GROUP BY 1
    ) b USING (k)
)
SELECT e.sum_est, e.nj AS n_sketches,
       (e.sum_est // e.nj)::BIGINT AS est_join,
       x.exact_join,
       abs(e.sum_est // e.nj - x.exact_join)::BIGINT AS abs_err
FROM est e CROSS JOIN exact x
"""


def q_priority_sample_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority-sampling subset-sum estimates per order status vs exact
    (module doc)."""
    o = table(spark, sf_dir, "orders")
    w_ = F.round(F.col("o_totalprice") * 100).cast("long")
    h = hex32(F.concat(F.lit("ps|"), F.col("o_orderkey").cast("string")))
    rows = o.select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderkey").cast("long").alias("okey"),
        w_.alias("w"),
        F.expr(f"cast(cast(round(o_totalprice * 100) as bigint) * {PS_POW} "
               "as bigint)").alias("_wp"),
        (h + 1).alias("h1"),
    ).select(
        "status", "okey", "w",
        F.expr("cast(_wp div h1 as bigint)").alias("q"),
    )
    win = Window.orderBy(F.desc("q"), F.asc("okey"))
    ranked = rows.withColumn("rk", F.row_number().over(win)).filter(
        F.col("rk") <= PS_K + 1
    )
    tau = ranked.filter(F.col("rk") == PS_K + 1).select(
        F.col("q").alias("tau")
    )
    sample = ranked.filter(F.col("rk") <= PS_K)
    est = (
        sample.crossJoin(F.broadcast(tau))
        .groupBy("status")
        .agg(
            F.sum(F.greatest("w", "tau")).alias("est_cents"),
            F.count(F.lit(1)).alias("n_sampled"),
            F.max("tau").alias("tau"),
        )
    )
    exact = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.sum(w_).alias("exact_cents")
    )
    return (
        exact.join(est, "status", "left")
        .select(
            "status",
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
            F.coalesce("est_cents", F.lit(0)).cast("long").alias("est_cents"),
            F.col("exact_cents").cast("long").alias("exact_cents"),
            F.coalesce("tau", F.lit(0)).cast("long").alias("tau"),
        )
        .orderBy("status")
    )


_PS_H = DUCK_HEX32.format(x="'ps|' || o_orderkey::VARCHAR")

_PS_SQL = f"""
WITH rows_ AS (
    SELECT o_orderstatus AS status, o_orderkey::BIGINT AS okey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS w,
           (CAST(round(o_totalprice * 100) AS BIGINT) * {PS_POW})
             // (({_PS_H}) + 1) AS q
    FROM orders
),
ranked AS (
    SELECT *, row_number() OVER (ORDER BY q DESC, okey ASC) AS rk FROM rows_
    QUALIFY rk <= {PS_K + 1}
),
tau AS (SELECT q AS tau FROM ranked WHERE rk = {PS_K + 1}),
est AS (
    SELECT status,
           sum(greatest(w, (SELECT tau FROM tau)))::BIGINT AS est_cents,
           count(*)::BIGINT AS n_sampled,
           max((SELECT tau FROM tau))::BIGINT AS tau
    FROM ranked WHERE rk <= {PS_K}
    GROUP BY status
),
exact AS (
    SELECT o_orderstatus AS status,
           sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
               AS exact_cents
    FROM orders GROUP BY 1
)
SELECT x.status,
       coalesce(e.n_sampled, 0)::BIGINT AS n_sampled,
       coalesce(e.est_cents, 0)::BIGINT AS est_cents,
       x.exact_cents,
       coalesce(e.tau, 0)::BIGINT AS tau
FROM exact x LEFT JOIN est e USING (status)
ORDER BY x.status
"""


QUERIES = {
    "ams_join_est": q_ams_join_est,
    "priority_sample_est": q_priority_sample_est,
}

ORACLES = {
    "ams_join_est": _AMS_SQL,
    "priority_sample_est": _PS_SQL,
}
