"""Small-sample-corrected rate ranking, batch 72: Wilson lower bound
and empirical-Bayes shrinkage.

The problem both solve: ranking suppliers by raw return rate puts a
1-for-1 supplier above a 99-for-100 one. These are the two standard
corrections, used everywhere from comment ranking to supplier QC.

Scale design (100 TB):
- ``wilson_rank``: per-supplier return counts (one groupBy with
  map-side partial aggregation — the only full-data pass), then the
  Wilson score lower bound at z = 1.96 as a PURE EXPRESSION over the
  exact integer (returns, total) pair. Float discipline: every
  operation is IEEE correctly-rounded (division/sqrt, no libm
  transcendentals), but the two engines fuse the compound expression
  in slightly different orders (measured 1-ulp drift), so the bound is
  rounded to 9 decimals in BOTH engines before it feeds the ORDER BY —
  the ``quality_score`` precedent. Top-N worst suppliers by the bound,
  deterministic (bound, supp) tie-break.
- ``eb_shrinkage``: beta-binomial shrinkage of each supplier's rate
  toward the GLOBAL rate with prior strength M: shrunk = (x + M·p_g) /
  (n + M) = (x·G_n + M·G_x) / (G_n·(n + M)) — kept as an EXACT INTEGER
  numerator/denominator (G_n ≤ 2^31 keeps products < 2^63) plus one
  final division. The global totals join in as a 1-row broadcast
  cross (allowlisted pattern).

Reference parity: no stats layer in the reference; extends the
DQ/ranking family (``benford_audit``, ``gains_table``, ``topk``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

WILSON_Z = 1.96
WILSON_TOP = 25
EB_M = 20  # prior strength (pseudo-observations)


def _per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_suppkey").alias("supp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias("x"),
    )


def q_wilson_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-WILSON_TOP suppliers by Wilson lower bound of the return
    rate (worst first). See module docstring."""
    s = _per_supplier(spark, sf_dir)
    n = F.col("n").cast("double")
    p = F.col("x").cast("double") / n
    z2 = F.lit(WILSON_Z * WILSON_Z)
    lower = (
        p
        + z2 / (F.lit(2.0) * n)
        - F.lit(WILSON_Z)
        * F.sqrt(
            p * (F.lit(1.0) - p) / n
            + z2 / (F.lit(4.0) * n * n)
        )
    ) / (F.lit(1.0) + z2 / n)
    out = s.select(
        "supp",
        "n",
        "x",
        (F.col("x").cast("double") / n).alias("raw_rate"),
        # the compound expression drifts by 1 ulp between engines
        # (different fused evaluation order); round to 9 decimals — the
        # quality_score precedent — before it feeds the ORDER BY
        F.round(lower, 9).alias("wilson_lower"),
    )
    return out.orderBy(
        F.desc("wilson_lower"), F.asc("supp")
    ).limit(WILSON_TOP)


_WILSON_SQL = f"""
WITH s AS (
    SELECT l_suppkey AS supp, COUNT(*) AS n,
           CAST(SUM(CAST(l_returnflag = 'R' AS BIGINT)) AS BIGINT) AS x
    FROM lineitem GROUP BY 1
)
SELECT supp, n, x,
       CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS raw_rate,
       round((CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
        + {WILSON_Z * WILSON_Z} / (2.0 * CAST(n AS DOUBLE))
        - {WILSON_Z} * sqrt(
            (CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
            * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
            / CAST(n AS DOUBLE)
            + {WILSON_Z * WILSON_Z}
              / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
       / (1.0 + {WILSON_Z * WILSON_Z} / CAST(n AS DOUBLE)), 9) AS wilson_lower
FROM s
ORDER BY wilson_lower DESC, supp ASC
LIMIT {WILSON_TOP}
"""


def q_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrunk return rate per supplier (exact rational
    numerator/denominator). See module docstring."""
    s = _per_supplier(spark, sf_dir)
    g = s.agg(
        F.sum("n").alias("g_n"), F.sum("x").alias("g_x")
    )
    j = s.crossJoin(F.broadcast(g))
    num = F.col("x") * F.col("g_n") + F.lit(EB_M) * F.col("g_x")
    den = F.col("g_n") * (F.col("n") + F.lit(EB_M))
    return j.select(
        "supp",
        "n",
        "x",
        num.alias("shrunk_num"),
        den.alias("shrunk_den"),
        (num.cast("double") / den.cast("double")).alias("shrunk_rate"),
    ).orderBy("supp")


_EB_SQL = f"""
WITH s AS (
    SELECT l_suppkey AS supp, COUNT(*) AS n,
           CAST(SUM(CAST(l_returnflag = 'R' AS BIGINT)) AS BIGINT) AS x
    FROM lineitem GROUP BY 1
),
g AS (SELECT CAST(SUM(n) AS BIGINT) AS g_n, CAST(SUM(x) AS BIGINT) AS g_x
      FROM s)
SELECT supp, n, x,
       CAST(x * g.g_n + {EB_M} * g.g_x AS BIGINT) AS shrunk_num,
       CAST(g.g_n * (n + {EB_M}) AS BIGINT) AS shrunk_den,
       CAST(x * g.g_n + {EB_M} * g.g_x AS DOUBLE)
           / CAST(g.g_n * (n + {EB_M}) AS DOUBLE) AS shrunk_rate
FROM s CROSS JOIN g
ORDER BY supp
"""


QUERIES = {
    "wilson_rank": q_wilson_rank,
    "eb_shrinkage": q_eb_shrinkage,
}

ORACLES = {
    "wilson_rank": _WILSON_SQL,
    "eb_shrinkage": _EB_SQL,
}
