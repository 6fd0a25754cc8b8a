"""Causal-panel operators, batch 114: instrumental-variable (2SLS)
slope estimation from exact integer moment sums, and synthetic-control
donor weighting by exact grid search — the two members of the causal
family (diff_in_diff, cuped, psm_match, markov_removal,
shapley_attribution) that handle endogeneity and unit-level
counterfactuals.

Scale design (100 TB):
- ``iv_2sls``: the Wald/2SLS slope β = Cov(z,y)/Cov(z,x) needs only
  five moment sums (Σz, Σx, Σy, Σzx, Σzy) plus n and Σz² — ONE
  map-side partial aggregate over lineitem producing a single row,
  nothing else crosses the shuffle. Numerators n·Σzy − Σz·Σy are exact
  int64 at sandbox SFs (bounds in-code; the 10^12-row rewrite is the
  same aggregate in decimal(38,0)); the only floats are two final
  divisions (bit-identical single IEEE ops, leaf-rounded 9dp). z is
  the synthesized instrument l_partkey % 5, x the endogenous quantity,
  y revenue cents.
- ``synth_control``: units are the o_custkey % 4 panel (unit 0
  treated, 1..3 donors), outcome = weekly revenue dollars over
  1995-H1. The ONLY data-scale work is the (unit, week) keyed
  aggregate; the 26-week × 4-unit panel is then pivoted to one row per
  week (conditional sums — no join) and crossed with the 66-row
  integer weight simplex (w1+w2+w3 = 10, broadcast literal, bounded
  allowlisted tier). Pre-period (weeks 0-12) SSE is computed in
  ×10-scaled exact int64 dollars (bounds in-code), the argmin is one
  min-struct, and the post-period gap Σ(10·treated − synth) is the
  exact treatment-effect numerator. No float anywhere.

Reference parity: no causal layer in the reference; builder-brief
analytics extension completing the causal family above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

PRE_WEEKS = 13  # weeks 0..12 fit the weights
N_WEEKS = 26  # 1995-01-01 .. half a year
BASE_DATE = "1995-01-01"
# integer weight simplex in tenths: w1+w2+w3 = 10
SIMPLEX = [
    (a, b, 10 - a - b)
    for a in range(11)
    for b in range(11 - a)
]


def q_iv_2sls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald/2SLS slope of revenue cents on quantity instrumented by
    l_partkey % 5 (module doc): exact integer covariance numerators,
    first-stage and IV slopes leaf-rounded 9dp."""
    li = table(spark, sf_dir, "lineitem")
    z = (F.col("l_partkey") % 5).cast("long")
    x = F.col("l_quantity").cast("long")
    y = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(z).alias("sz"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(z * z).alias("szz"),
        F.sum(z * x).alias("szx"),
        F.sum(z * y).alias("szy"),
    )
    czy = F.col("n") * F.col("szy") - F.col("sz") * F.col("sy")
    czx = F.col("n") * F.col("szx") - F.col("sz") * F.col("sx")
    czz = F.col("n") * F.col("szz") - F.col("sz") * F.col("sz")
    return m.select(
        F.col("n").cast("long").alias("n"),
        czy.cast("long").alias("cov_zy_num"),
        czx.cast("long").alias("cov_zx_num"),
        czz.cast("long").alias("var_z_num"),
        F.round(czy / czx, 9).alias("beta_iv"),
        F.round(czx / czz, 9).alias("stage1_slope"),
    )


_IV_SQL = """
WITH m AS (
    SELECT count(*)::BIGINT AS n,
           sum((l_partkey % 5))::BIGINT AS sz,
           sum(CAST(l_quantity AS BIGINT))::BIGINT AS sx,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))::BIGINT AS sy,
           sum((l_partkey % 5) * (l_partkey % 5))::BIGINT AS szz,
           sum((l_partkey % 5) * CAST(l_quantity AS BIGINT))::BIGINT AS szx,
           sum((l_partkey % 5) *
               CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))::BIGINT AS szy
    FROM lineitem
)
SELECT n,
       (n * szy - sz * sy)::BIGINT AS cov_zy_num,
       (n * szx - sz * sx)::BIGINT AS cov_zx_num,
       (n * szz - sz * sz)::BIGINT AS var_z_num,
       round((n * szy - sz * sy)::DOUBLE / (n * szx - sz * sx), 9) AS beta_iv,
       round((n * szx - sz * sx)::DOUBLE / (n * szz - sz * sz), 9) AS stage1_slope
FROM m
"""


def q_synth_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best integer-tenths donor weights for unit 0's weekly revenue
    panel, exact pre-period SSE and post-period gap (module doc)."""
    o = table(spark, sf_dir, "orders")
    base = F.lit(BASE_DATE).cast("date")
    wk = F.floor(F.datediff(F.col("o_orderdate"), base) / 7).cast("long")
    panel = (
        o.filter((F.col("o_orderdate") >= base) & (wk < N_WEEKS))
        .groupBy(
            (F.col("o_custkey") % 4).cast("long").alias("unit"),
            wk.alias("week"),
        )
        .agg(
            F.expr(
                "cast(sum(cast(round(o_totalprice * 100) as bigint)) div 100"
                " as bigint)"
            ).alias("dollars")
        )
    )
    wide = panel.groupBy("week").agg(
        F.sum(F.when(F.col("unit") == 0, F.col("dollars")).otherwise(0)).alias("y0"),
        F.sum(F.when(F.col("unit") == 1, F.col("dollars")).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("unit") == 2, F.col("dollars")).otherwise(0)).alias("d2"),
        F.sum(F.when(F.col("unit") == 3, F.col("dollars")).otherwise(0)).alias("d3"),
    )
    grid = spark.createDataFrame(SIMPLEX, "w1 long, w2 long, w3 long")
    diff = (
        F.col("y0") * 10
        - (
            F.col("w1") * F.col("d1")
            + F.col("w2") * F.col("d2")
            + F.col("w3") * F.col("d3")
        )
    )
    j = wide.crossJoin(F.broadcast(grid))
    agg = j.groupBy("w1", "w2", "w3").agg(
        F.sum(
            F.when(F.col("week") < PRE_WEEKS, diff * diff).otherwise(0)
        ).alias("pre_sse"),
        F.sum(
            F.when(F.col("week") >= PRE_WEEKS, diff).otherwise(0)
        ).alias("post_gap10"),
        F.count(F.lit(1)).alias("n_weeks"),
    )
    best = agg.agg(
        F.min(
            F.struct("pre_sse", "w1", "w2", "w3", "post_gap10", "n_weeks")
        ).alias("m")
    )
    return best.select(
        F.col("m.w1").cast("long").alias("w1"),
        F.col("m.w2").cast("long").alias("w2"),
        F.col("m.w3").cast("long").alias("w3"),
        F.col("m.pre_sse").cast("long").alias("pre_sse"),
        F.col("m.post_gap10").cast("long").alias("post_gap10"),
        F.col("m.n_weeks").cast("long").alias("n_weeks"),
    )


def _simplex_sql() -> str:
    rows = ", ".join(f"({a}, {b}, {c})" for a, b, c in SIMPLEX)
    return f"SELECT * FROM (VALUES {rows}) AS t(w1, w2, w3)"


_SYNTH_SQL = f"""
WITH panel AS (
    SELECT (o_custkey % 4)::BIGINT AS unit,
           (date_diff('day', DATE '{BASE_DATE}', o_orderdate) // 7)::BIGINT
               AS week,
           (sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100)::BIGINT
               AS dollars
    FROM orders
    WHERE o_orderdate >= DATE '{BASE_DATE}'
      AND date_diff('day', DATE '{BASE_DATE}', o_orderdate) // 7 < {N_WEEKS}
    GROUP BY 1, 2
),
wide AS (
    SELECT week,
           sum(CASE WHEN unit = 0 THEN dollars ELSE 0 END)::BIGINT AS y0,
           sum(CASE WHEN unit = 1 THEN dollars ELSE 0 END)::BIGINT AS d1,
           sum(CASE WHEN unit = 2 THEN dollars ELSE 0 END)::BIGINT AS d2,
           sum(CASE WHEN unit = 3 THEN dollars ELSE 0 END)::BIGINT AS d3
    FROM panel GROUP BY week
),
grid AS ({_simplex_sql()}),
agg AS (
    SELECT w1, w2, w3,
           sum(CASE WHEN week < {PRE_WEEKS}
                    THEN (y0*10 - (w1*d1 + w2*d2 + w3*d3))
                         * (y0*10 - (w1*d1 + w2*d2 + w3*d3))
                    ELSE 0 END)::BIGINT AS pre_sse,
           sum(CASE WHEN week >= {PRE_WEEKS}
                    THEN y0*10 - (w1*d1 + w2*d2 + w3*d3)
                    ELSE 0 END)::BIGINT AS post_gap10,
           count(*)::BIGINT AS n_weeks
    FROM wide CROSS JOIN grid
    GROUP BY w1, w2, w3
),
best AS (
    SELECT min(struct_pack(pre_sse := pre_sse, w1 := w1, w2 := w2,
                           w3 := w3, post_gap10 := post_gap10,
                           n_weeks := n_weeks)) AS m
    FROM agg
)
SELECT m.w1::BIGINT AS w1, m.w2::BIGINT AS w2, m.w3::BIGINT AS w3,
       m.pre_sse::BIGINT AS pre_sse, m.post_gap10::BIGINT AS post_gap10,
       m.n_weeks::BIGINT AS n_weeks
FROM best
"""


QUERIES = {
    "iv_2sls": q_iv_2sls,
    "synth_control": q_synth_control,
}

ORACLES = {
    "iv_2sls": _IV_SQL,
    "synth_control": _SYNTH_SQL,
}
