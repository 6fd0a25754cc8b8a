"""Rank-based tests, batch 144: Mann–Whitney U and Kruskal–Wallis H
over order totals by priority — the nonparametric two-sample and
K-sample location tests next to ks_test/runs_test/spearman_ranks,
with ties handled by EXACT doubled midranks.

Scale design (100 TB):
- Pooled ranking never touches row-level windows: ONE (value, group)
  keyed aggregate produces the distinct-value table, a window over
  the DISTINCT VALUES (value-cardinality-bounded — the suffix_rank
  rank-assignment discipline) yields cumulative counts, and
  2·midrank = 2·cum − cnt + 1 is exact int64 — so the doubled rank
  sums 2R_g = Σ m_g·(2cum − cnt + 1) and the tie correction Σ(t³−t)
  are pure integers. Only the final z / H evaluate in doubles (fixed
  order; sqrt is IEEE-correctly-rounded in both engines), 9dp.
- ``mann_whitney``: pool = '1-URGENT' vs '5-LOW' orders only (the
  classic two-sample pool); emits n1, n2, 2R₁, 2U₁ = 2R₁ − n1(n1+1),
  tie_sum, and the tie-corrected normal-approximation z.
- ``kruskal_wallis``: all five priorities; per-group rows
  (prio, n_k, two_rk) carry the shared totals and the tie-corrected
  H (identical on every row — the metrics_rollup broadcast shape).

Reference parity: no stats layer in the reference; extends ks_test,
runs_test, mcnemar, anova_f, spearman_ranks (statsops family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import table

MW_A = "1-URGENT"
MW_B = "5-LOW"


def _ranked(spark: SparkSession, sf_dir: str, two_group: bool) -> DataFrame:
    """(v, prio, m, cnt, two_mid): per distinct order-total value (in
    exact cents) and priority, its multiplicity plus the pooled
    doubled midrank."""
    o = table(spark, sf_dir, "orders")
    if two_group:
        o = o.filter(F.col("o_orderpriority").isin(MW_A, MW_B))
    vals = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        F.col("o_orderpriority").alias("prio"),
    )
    per = vals.groupBy("v", "prio").agg(F.count(F.lit(1)).alias("m"))
    dv = per.groupBy("v").agg(F.sum("m").alias("cnt"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    dv = dv.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "two_mid", (2 * F.col("cum") - F.col("cnt") + 1).cast("long")
    )
    return per.join(dv.select("v", "cnt", "two_mid"), "v")


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (module doc): n1, n2, two_r1, two_u1, tie_sum, z."""
    r = _ranked(spark, sf_dir, two_group=True)
    ties = r.groupBy("v").agg(F.max("cnt").alias("t"))
    piv = r.agg(
        F.sum(F.when(F.col("prio") == MW_A, F.col("m")).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("prio") == MW_B, F.col("m")).otherwise(0))
        .cast("long")
        .alias("n2"),
        F.sum(
            F.when(
                F.col("prio") == MW_A, F.col("m") * F.col("two_mid")
            ).otherwise(0)
        )
        .cast("long")
        .alias("two_r1"),
    ).crossJoin(
        F.broadcast(
            ties.agg(
                F.sum(
                    F.col("t") * F.col("t") * F.col("t") - F.col("t")
                )
                .cast("long")
                .alias("tie_sum")
            )
        )
    )
    piv = piv.withColumn(
        "two_u1", (F.col("two_r1") - F.col("n1") * (F.col("n1") + 1))
    )
    z = F.expr(
        "round((CAST(two_u1 AS DOUBLE) - CAST(n1 AS DOUBLE) * n2) / "
        "(2 * sqrt(CAST(n1 AS DOUBLE) * n2 / 12 * ((n1 + n2 + 1) - "
        "CAST(tie_sum AS DOUBLE) / ((n1 + n2) * (n1 + n2 - 1.0))))), 9)"
    )
    return piv.select(
        "n1", "n2", "two_r1",
        F.col("two_u1").cast("long").alias("two_u1"),
        "tie_sum", z.alias("z"),
    )


def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per priority (module doc): (prio, n_k, two_rk, n, tie_sum, h)."""
    r = _ranked(spark, sf_dir, two_group=False)
    per_g = r.groupBy("prio").agg(
        F.sum("m").cast("long").alias("n_k"),
        F.sum(F.col("m") * F.col("two_mid")).cast("long").alias("two_rk"),
    )
    ties = r.groupBy("v").agg(F.max("cnt").alias("t"))
    tots = (
        per_g.agg(F.sum("n_k").cast("long").alias("n"))
        .crossJoin(
            ties.agg(
                F.sum(
                    F.col("t") * F.col("t") * F.col("t") - F.col("t")
                )
                .cast("long")
                .alias("tie_sum")
            )
        )
    )
    j = per_g.crossJoin(F.broadcast(tots))
    # H = 12/(n(n+1)) Σ R_k²/n_k − 3(n+1); with 2R_k ints:
    # Σ R_k²/n_k = Σ (two_rk)²/(4 n_k). Sum in prio order inside one
    # row for a fixed double order.
    packed = j.groupBy("n", "tie_sum").agg(
        F.array_sort(
            F.collect_list(F.struct("prio", "n_k", "two_rk"))
        ).alias("gs")
    )
    ssum = F.aggregate(
        F.col("gs"),
        F.lit(0.0),
        lambda acc, g: acc
        + (g["two_rk"].cast("double") * g["two_rk"] / (4 * g["n_k"])),
    )
    h_raw = (
        F.lit(12.0) / (F.col("n").cast("double") * (F.col("n") + 1)) * ssum
        - 3 * (F.col("n").cast("double") + 1)
    )
    h = F.round(
        h_raw
        / (
            F.lit(1.0)
            - F.col("tie_sum").cast("double")
            / (
                F.col("n").cast("double") * F.col("n") * F.col("n")
                - F.col("n")
            )
        ),
        9,
    )
    fin = packed.select(
        "n", "tie_sum", h.alias("h"), F.explode("gs").alias("g")
    )
    return fin.select(
        F.col("g.prio").alias("prio"),
        F.col("g.n_k").alias("n_k"),
        F.col("g.two_rk").alias("two_rk"),
        "n",
        "tie_sum",
        "h",
    ).orderBy("prio")


def _ranked_sql(two_group: bool) -> str:
    filt = (
        f"WHERE o_orderpriority IN ('{MW_A}', '{MW_B}')" if two_group else ""
    )
    return f"""
vals AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
           o_orderpriority AS prio
    FROM orders {filt}
),
per AS (SELECT v, prio, count(*)::BIGINT AS m FROM vals GROUP BY v, prio),
dv AS (
    SELECT v, cnt, (2 * cum - cnt + 1)::BIGINT AS two_mid FROM (
        SELECT v, cnt,
               sum(cnt) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM (SELECT v, sum(m)::BIGINT AS cnt FROM per GROUP BY v)
    )
),
r AS (SELECT per.v, prio, m, cnt, two_mid FROM per JOIN dv USING (v))
"""


_MW_SQL = f"""
WITH {_ranked_sql(True)},
ties AS (SELECT sum(t*t*t - t)::BIGINT AS tie_sum FROM
         (SELECT v, max(cnt) AS t FROM r GROUP BY v)),
piv AS (
    SELECT sum(CASE WHEN prio = '{MW_A}' THEN m ELSE 0 END)::BIGINT AS n1,
           sum(CASE WHEN prio = '{MW_B}' THEN m ELSE 0 END)::BIGINT AS n2,
           sum(CASE WHEN prio = '{MW_A}' THEN m * two_mid ELSE 0 END)
               ::BIGINT AS two_r1
    FROM r
)
SELECT n1, n2, two_r1,
       (two_r1 - n1 * (n1 + 1))::BIGINT AS two_u1,
       tie_sum,
       round((CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) - CAST(n1 AS DOUBLE)
           * n2) / (2 * sqrt(CAST(n1 AS DOUBLE) * n2 / 12 * ((n1 + n2 + 1)
           - CAST(tie_sum AS DOUBLE) / ((n1 + n2) * (n1 + n2 - 1.0))))), 9)
           AS z
FROM piv, ties
"""

def _kw_sql() -> str:
    # the fold must mirror Spark's aggregate over structs: acc +
    # two_rk²/(4·n_k) in prio order — elements ride as [two_rk, n_k]
    fold = (
        "list_reduce(list_prepend([0.0::DOUBLE, 0.0::DOUBLE], "
        "list_transform(gs, g -> [CAST(g.two_rk AS DOUBLE), "
        "CAST(g.n_k AS DOUBLE)])), "
        "(acc, g) -> [acc[1] + g[1] * g[1] / (4 * g[2]), 0.0::DOUBLE])[1]"
    )
    return f"""
WITH {_ranked_sql(False)},
per_g AS (
    SELECT prio, sum(m)::BIGINT AS n_k,
           sum(m * two_mid)::BIGINT AS two_rk
    FROM r GROUP BY prio
),
ties AS (SELECT sum(t*t*t - t)::BIGINT AS tie_sum FROM
         (SELECT v, max(cnt) AS t FROM r GROUP BY v)),
tots AS (SELECT sum(n_k)::BIGINT AS n FROM per_g),
packed AS (
    SELECT n, tie_sum,
           list(struct_pack(prio := prio, n_k := n_k, two_rk := two_rk)
                ORDER BY prio) AS gs
    FROM per_g, ties, tots
    GROUP BY n, tie_sum
),
hh AS (
    SELECT n, tie_sum, gs,
           round((12.0 / (CAST(n AS DOUBLE) * (n + 1)) * {fold}
               - 3 * (CAST(n AS DOUBLE) + 1))
               / (1.0 - CAST(tie_sum AS DOUBLE)
                  / (CAST(n AS DOUBLE) * n * n - n)), 9) AS h
    FROM packed
)
SELECT g.prio AS prio, g.n_k AS n_k, g.two_rk AS two_rk, n, tie_sum, h
FROM (SELECT n, tie_sum, h, unnest(gs) AS g FROM hh)
ORDER BY prio
"""


QUERIES = {
    "mann_whitney": q_mann_whitney,
    "kruskal_wallis": q_kruskal_wallis,
}

ORACLES = {
    "mann_whitney": _MW_SQL,
    "kruskal_wallis": _kw_sql(),
}
