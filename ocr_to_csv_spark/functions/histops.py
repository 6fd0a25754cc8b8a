"""Histogram optimization + inequality accounting, batch 120:
V-optimal histogram construction by exact interval DP over
pre-aggregated frequency cells, and the Theil inequality index with
its between/within-nation decomposition — the planner's best-possible
B-bucket summary (vs the fixed equi-width grid selectivity_est audits)
and the revenue-concentration readout next to gini.

Scale design (100 TB):
- ``vopt_hist``: the data-scale work is ONE keyed aggregate collapsing
  the order-value scan to C=20 equi-width frequency cells (the
  selectivity_est bucketing; the 1-row min/max cross is the allowlisted
  stats tier). The V-optimal DP — minimize total within-bucket SSE of
  cell frequencies over B=4 buckets — runs on those 20 cells collected
  into ONE row (cell-count bounded by construction), with segment cost
  floor(1000·(len·Σc² − (Σc)²) / len) in milli-units: exact int64
  prefix sums, a single floor division per segment in a canonical
  order, so both engines compute the identical objective bit-for-bit.
  The DP over (prefix, buckets-used) is a bounded generated-expression
  program (the join_order_dp device): C·B states, each a least() over
  ≤C split candidates.
- ``theil_decomp``: T = Σ (x_i/X)·ln(x_i/μ) over per-customer revenue,
  decomposed into between-nation + within-nation terms. Per-customer
  revenue is one keyed agg (exact cents); the global totals are a
  1-row cross (allowlisted); every ln term is leaf-rounded to INTEGER
  nano-units per customer/nation BEFORE summation, so the corpus-scale
  sums are exact int64 and order-free (the heldout_ppl discipline).
  Output: one row per nation (share, within contribution) + the
  between/total summary via the nation-bounded rollup.

Reference parity: no histogram/inequality layer in the reference;
completes the planner family (selectivity_est, join_order_dp,
equidepth_hist) and the concentration family (gini, market_share,
herfindahl-style rollups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

VH_C = 20  # frequency cells entering the DP
VH_B = 4  # histogram buckets


def _vh_exprs() -> dict[str, str]:
    """DP expression program over one row holding p_0..p_C (prefix
    counts) and q_0..q_C (prefix sums of squared counts). Segment
    (i, j] cost in milli-units; dp_b_j = min cost of covering cells
    (0, j] with b buckets."""
    ex: dict[str, str] = {}
    for i in range(VH_C):
        for j in range(i + 1, VH_C + 1):
            ln = j - i
            ex[f"sc_{i}_{j}"] = (
                f"CAST(floor(1000.0 * ({ln} * (q_{j} - q_{i}) "
                f"- (p_{j} - p_{i}) * (p_{j} - p_{i})) / {ln}) AS BIGINT)"
            )
    for j in range(1, VH_C + 1):
        ex[f"dp_1_{j}"] = f"sc_0_{j}"
    for b in range(2, VH_B + 1):
        for j in range(b, VH_C + 1):
            terms = [
                f"(dp_{b - 1}_{i} + sc_{i}_{j})" for i in range(b - 1, j)
            ]
            ex[f"dp_{b}_{j}"] = (
                terms[0] if len(terms) == 1 else f"least({', '.join(terms)})"
            )
    # recover the chosen boundaries greedily from the DP table
    ex["cut_3"] = " ".join(
        ["CASE"]
        + [
            f"WHEN (dp_{VH_B - 1}_{i} + sc_{i}_{VH_C}) = dp_{VH_B}_{VH_C} "
            f"THEN CAST({i} AS BIGINT)"
            for i in range(VH_B - 1, VH_C)
        ]
        + ["END"]
    )
    return ex


def q_vopt_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V-optimal B=4 histogram over C=20 frequency cells (module doc):
    per-b rows (n_buckets_used, best_cost_milli) + the last cut."""
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    vals = o.select(cents.alias("v"))
    mm = vals.agg(F.min("v").alias("lo"), (F.max("v") + 1).alias("hi1"))
    binfo = mm.select(
        "lo",
        F.expr(f"cast((hi1 - lo + {VH_C} - 1) div {VH_C} as bigint)").alias("w"),
    )
    cells = (
        vals.crossJoin(F.broadcast(binfo))
        .select(F.expr("cast((v - lo) div w as bigint)").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # one row: c_0..c_{C-1} (missing cells are 0), then prefixes
    piv = cells.agg(
        *[
            F.sum(F.when(F.col("b") == i, F.col("cnt")).otherwise(0)).alias(
                f"c_{i}"
            )
            for i in range(VH_C)
        ]
    )
    piv = piv.withColumn("p_0", F.expr("CAST(0 AS BIGINT)")).withColumn(
        "q_0", F.expr("CAST(0 AS BIGINT)")
    )
    for j in range(1, VH_C + 1):
        piv = piv.withColumn(f"p_{j}", F.expr(f"p_{j - 1} + c_{j - 1}"))
        piv = piv.withColumn(
            f"q_{j}", F.expr(f"q_{j - 1} + c_{j - 1} * c_{j - 1}")
        )
    for name, text in _vh_exprs().items():
        piv = piv.withColumn(name, F.expr(text))
    rows = ", ".join(
        f"CAST({b} AS BIGINT), dp_{b}_{VH_C}" for b in range(1, VH_B + 1)
    )
    return piv.select(
        F.expr(
            f"stack({VH_B}, {rows}) AS (n_buckets, best_cost_milli)"
        ),
        F.col("cut_3").alias("last_cut"),
    ).orderBy("n_buckets")


def _vh_sql() -> str:
    cells = f"""
vals AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
mm AS (
    SELECT min(v) AS lo,
           (max(v) + 1 - min(v) + {VH_C} - 1) // {VH_C} AS w
    FROM vals
),
cells AS (
    SELECT (v - (SELECT lo FROM mm)) // (SELECT w FROM mm) AS b,
           count(*)::BIGINT AS cnt
    FROM vals GROUP BY 1
),
piv AS (
    SELECT {', '.join(
        f'sum(CASE WHEN b = {i} THEN cnt ELSE 0 END)::BIGINT AS c_{i}'
        for i in range(VH_C))}
    FROM cells
)"""
    layers = [cells]
    prev = "piv"
    pre = ["CAST(0 AS BIGINT) AS p_0", "CAST(0 AS BIGINT) AS q_0"]
    layers.append(f"l0 AS (SELECT *, {', '.join(pre)} FROM {prev})")
    prev = "l0"
    k = 1
    for j in range(1, VH_C + 1):
        layers.append(
            f"l{k} AS (SELECT *, p_{j - 1} + c_{j - 1} AS p_{j}, "
            f"q_{j - 1} + c_{j - 1} * c_{j - 1} AS q_{j} FROM {prev})"
        )
        prev = f"l{k}"
        k += 1
    for name, text in _vh_exprs().items():
        layers.append(f"l{k} AS (SELECT *, {text} AS {name} FROM {prev})")
        prev = f"l{k}"
        k += 1
    selects = " UNION ALL ".join(
        f"SELECT {b}::BIGINT AS n_buckets, dp_{b}_{VH_C} AS best_cost_milli, "
        f"cut_3 AS last_cut FROM {prev}"
        for b in range(1, VH_B + 1)
    )
    return "WITH " + ",\n".join(layers) + "\n" + selects + "\nORDER BY n_buckets"


def q_theil_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality of per-customer revenue with the between/
    within-nation decomposition in exact nano-units (module doc):
    one row per nation + share columns."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    rev = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
        .join(
            c.select(
                F.col("c_custkey").alias("o_custkey"),
                (F.col("c_nationkey") % 5).cast("long").alias("grp"),
            ),
            "o_custkey",
        )
    )
    tot = rev.agg(
        F.sum("cents").alias("x_tot"), F.count(F.lit(1)).alias("n_tot")
    )
    # per-customer Theil term: (x/X)·ln(x·n/X), leaf-rounded nano
    term = F.round(
        F.col("cents").cast("double")
        / F.col("x_tot")
        * F.log(
            F.col("cents").cast("double")
            * F.col("n_tot")
            / F.col("x_tot")
        )
        * 1e9
    ).cast("long")
    within = (
        rev.crossJoin(F.broadcast(tot))
        .select("grp", "cents", term.alias("t_nano"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_g"),
            F.sum("cents").alias("x_g"),
            F.sum("t_nano").alias("t_g_nano"),
        )
    )
    # between-group term per group: (X_g/X)·ln((X_g/X)/(n_g/n))
    between = within.crossJoin(F.broadcast(tot)).select(
        "grp",
        F.col("n_g").cast("long").alias("n_g"),
        F.col("x_g").cast("long").alias("x_g"),
        F.col("t_g_nano").cast("long").alias("t_total_nano"),
        F.round(
            F.col("x_g").cast("double")
            / F.col("x_tot")
            * F.log(
                (F.col("x_g").cast("double") / F.col("x_tot"))
                / (F.col("n_g").cast("double") / F.col("n_tot"))
            )
            * 1e9
        )
        .cast("long")
        .alias("between_nano"),
        F.floor(F.col("x_g") * 1000 / F.col("x_tot"))
        .cast("long")
        .alias("share_milli"),
    )
    return between.orderBy("grp")


_THEIL_SQL = """
WITH rev AS (
    SELECT o.o_custkey,
           sum(CAST(round(o.o_totalprice * 100) AS BIGINT))::BIGINT AS cents,
           (c.c_nationkey % 5)::BIGINT AS grp
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY o.o_custkey, c.c_nationkey % 5
),
tot AS (
    SELECT sum(cents)::BIGINT AS x_tot, count(*)::BIGINT AS n_tot FROM rev
),
terms AS (
    SELECT grp, cents,
           CAST(round(CAST(cents AS DOUBLE) / (SELECT x_tot FROM tot)
                      * ln(CAST(cents AS DOUBLE) * (SELECT n_tot FROM tot)
                           / (SELECT x_tot FROM tot)) * 1e9) AS BIGINT)
               AS t_nano
    FROM rev
),
within AS (
    SELECT grp, count(*)::BIGINT AS n_g, sum(cents)::BIGINT AS x_g,
           sum(t_nano)::BIGINT AS t_g_nano
    FROM terms GROUP BY grp
)
SELECT grp, n_g, x_g, t_g_nano AS t_total_nano,
       CAST(round(CAST(x_g AS DOUBLE) / (SELECT x_tot FROM tot)
                  * ln((CAST(x_g AS DOUBLE) / (SELECT x_tot FROM tot))
                       / (CAST(n_g AS DOUBLE) / (SELECT n_tot FROM tot)))
                  * 1e9) AS BIGINT) AS between_nano,
       CAST(floor(x_g * 1000.0 / (SELECT x_tot FROM tot)) AS BIGINT)
           AS share_milli
FROM within
ORDER BY grp
"""


QUERIES = {
    "vopt_hist": q_vopt_hist,
    "theil_decomp": q_theil_decomp,
}

ORACLES = {
    "vopt_hist": _vh_sql(),
    "theil_decomp": _THEIL_SQL,
}
