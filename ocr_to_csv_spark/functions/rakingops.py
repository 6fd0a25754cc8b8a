"""Survey statistics, batch 152: iterative proportional fitting
(raking) of the segment × region customer table to uniform margins,
and Simpson's diversity index — the weighting-adjustment workhorse of
survey/census pipelines next to neyman_alloc/stratified_sample, and
the exact-rational concentration measure next to gini/theil_decomp.

Scale design (100 TB):
- ``ipf_raking``: the 5×5 contingency (TPC-H's fixed segment and
  region enumerations — literal axes, so the pivot is schema-stable)
  comes from ONE keyed aggregate pivoted to a single row of exact
  int64 counts; the K=4 IPF rounds (row-scale then column-scale to
  tot/5 targets) run as generated scalar expressions layered over
  that row — the power_iteration device, identical text both engines,
  zero-row CASE-guarded. Emits each cell's observed count and fitted
  weight plus the worst post-fit margin error — the convergence
  certificate (IPF on a positive table converges geometrically).
- ``simpson_diversity``: per nation, D = 1 − Σ n_i(n_i−1) / (N(N−1))
  over customer segments — numerator/denominator exact int64, one
  division at the end (micro units).

Reference parity: no survey layer in the reference; extends
neyman_alloc, stratified_sample, quantile_norm, target_encode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
REGIONS = ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
IPF_ROUNDS = 4
D = 5


def _ipf_exprs() -> dict[str, str]:
    """Layered expression text over pivot columns c_{i}_{j} and tot;
    w{L}_{i}_{j} after each half-step L."""
    ex: dict[str, str] = {}
    for i in range(D):
        for j in range(D):
            ex[f"w0_{i}_{j}"] = f"CAST(c_{i}_{j} AS DOUBLE)"
    lvl = 0
    for _ in range(IPF_ROUNDS):
        # row scale
        nxt = lvl + 1
        for i in range(D):
            rsum = " + ".join(f"w{lvl}_{i}_{j}" for j in range(D))
            for j in range(D):
                ex[f"w{nxt}_{i}_{j}"] = (
                    f"CASE WHEN ({rsum}) > 0 THEN w{lvl}_{i}_{j} * "
                    f"((CAST(tot AS DOUBLE) / {D}) / ({rsum})) "
                    f"ELSE 0.0 END"
                )
        lvl = nxt
        # column scale
        nxt = lvl + 1
        for j in range(D):
            csum = " + ".join(f"w{lvl}_{i}_{j}" for i in range(D))
            for i in range(D):
                ex[f"w{nxt}_{i}_{j}"] = (
                    f"CASE WHEN ({csum}) > 0 THEN w{lvl}_{i}_{j} * "
                    f"((CAST(tot AS DOUBLE) / {D}) / ({csum})) "
                    f"ELSE 0.0 END"
                )
        lvl = nxt
    # worst margin error after the final level
    errs = []
    for i in range(D):
        rsum = " + ".join(f"w{lvl}_{i}_{j}" for j in range(D))
        errs.append(f"abs(({rsum}) - CAST(tot AS DOUBLE) / {D})")
    for j in range(D):
        csum = " + ".join(f"w{lvl}_{i}_{j}" for i in range(D))
        errs.append(f"abs(({csum}) - CAST(tot AS DOUBLE) / {D})")
    ex["margin_err"] = "greatest(" + ", ".join(errs) + ")"
    ex["final_lvl"] = str(lvl)  # consumed by the callers, not an expr
    return ex


def q_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPF-fitted weights per (segment, region) cell (module doc):
    (seg, region, obs, fitted, margin_err)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    cells = (
        c.join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .select(F.col("c_mktsegment").alias("seg"), F.col("r_name").alias("reg"))
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("tot")]
    for i, s in enumerate(SEGMENTS):
        for j, g in enumerate(REGIONS):
            aggs.append(
                F.sum(
                    ((F.col("seg") == s) & (F.col("reg") == g)).cast("long")
                )
                .cast("long")
                .alias(f"c_{i}_{j}")
            )
    piv = cells.agg(*aggs)
    ex = _ipf_exprs()
    lvl = ex.pop("final_lvl")
    for name, text in ex.items():
        piv = piv.withColumn(name, F.expr(text))
    stacked = ", ".join(
        f"'{s}', '{g}', c_{i}_{j}, round(w{lvl}_{i}_{j}, 9)"
        for i, s in enumerate(SEGMENTS)
        for j, g in enumerate(REGIONS)
    )
    return piv.select(
        F.expr(
            f"stack({D * D}, {stacked}) AS (seg, region, obs, fitted)"
        ),
        F.round(F.col("margin_err"), 9).alias("margin_err"),
    ).orderBy("seg", "region")


def q_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson diversity of customer segments per nation (module doc):
    (nation, n, num, den, d_micro)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    per = (
        c.join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"), F.col("c_mktsegment"))
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    return (
        per.groupBy("nation")
        .agg(
            F.sum("k").cast("long").alias("n"),
            F.sum(F.col("k") * (F.col("k") - 1)).cast("long").alias("num"),
        )
        .filter(F.col("n") > 1)
        .select(
            "nation",
            "n",
            "num",
            (F.col("n") * (F.col("n") - 1)).cast("long").alias("den"),
            F.expr(
                "1000000L - (1000000L * num) div (n * (n - 1))"
            ).alias("d_micro"),
        )
        .orderBy("nation")
    )


def _ipf_sql() -> str:
    aggs = ["count(*)::BIGINT AS tot"]
    for i, s in enumerate(SEGMENTS):
        for j, g in enumerate(REGIONS):
            aggs.append(
                f"sum(CASE WHEN seg = '{s}' AND reg = '{g}' THEN 1 ELSE 0 "
                f"END)::BIGINT AS c_{i}_{j}"
            )
    ex = _ipf_exprs()
    lvl = ex.pop("final_lvl")
    layers = [
        """cells AS (
    SELECT c_mktsegment AS seg, r_name AS reg
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey)""",
        "piv AS (SELECT " + ", ".join(aggs) + " FROM cells)",
    ]
    prev = "piv"
    for k, (name, text) in enumerate(ex.items()):
        cur = f"l{k}"
        layers.append(f"{cur} AS (SELECT *, {text} AS {name} FROM {prev})")
        prev = cur
    sel = " UNION ALL ".join(
        f"SELECT '{s}' AS seg, '{g}' AS region, c_{i}_{j} AS obs, "
        f"round(w{lvl}_{i}_{j}, 9) AS fitted, "
        f"round(margin_err, 9) AS margin_err FROM {prev}"
        for i, s in enumerate(SEGMENTS)
        for j, g in enumerate(REGIONS)
    )
    return "WITH " + ",\n".join(layers) + "\n" + sel + "\nORDER BY seg, region"


_SIMPSON_SQL = """
WITH per AS (
    SELECT n_name AS nation, c_mktsegment, count(*)::BIGINT AS k
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name, c_mktsegment
)
SELECT nation,
       sum(k)::BIGINT AS n,
       sum(k * (k - 1))::BIGINT AS num,
       (sum(k) * (sum(k) - 1))::BIGINT AS den,
       (1000000 - (1000000 * sum(k * (k - 1))) //
           (sum(k) * (sum(k) - 1)))::BIGINT AS d_micro
FROM per
GROUP BY nation
HAVING sum(k) > 1
ORDER BY nation
"""

QUERIES = {
    "ipf_raking": q_ipf_raking,
    "simpson_diversity": q_simpson_diversity,
}

ORACLES = {
    "ipf_raking": _ipf_sql(),
    "simpson_diversity": _SIMPSON_SQL,
}
