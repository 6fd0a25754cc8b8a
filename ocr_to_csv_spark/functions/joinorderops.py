"""Join-order optimization, batch 118a: Selinger-style dynamic
programming over the customer→orders→lineitem→supplier chain, with
cardinalities estimated from DATA-derived statistics (row counts +
join-key NDVs) — the planner self-audit that shows what the engine's
own cost-based optimizer would conclude from its stats, exposed as a
query so the conclusion itself is oracle-checkable.

Scale design (100 TB):
- The ONLY data-scale work is eight 1-row aggregates (count +
  approx-exact NDV per join column; the 1-row crosses are the
  allowlisted stats tier). The DP itself is METADATA: a chain of four
  relations has only the 10 contiguous intervals as connected
  subsets, so the whole Selinger table — estimated cardinality via
  |A|·|B|/max(ndv) with a CANONICAL left-to-right integer evaluation
  order (multiply then floor-divide per added relation, so int64
  stays bounded by real intermediate sizes at any SF), C_out cost
  cost(i,j) = min over splits + card(i,j), and the argmin split — is
  ~40 generated scalar expressions over a ONE-ROW pivot (the
  markov_removal device). The expression TEXT is generated once and
  fed to both engines (Spark `div` vs DuckDB `//` is the only
  substitution), so there is no reimplementation to drift.
- Output = 10 rows (interval, est card, best cost, best split): the
  plan shape a 1000-executor job would be handed.

Reference parity: no planner in the reference; completes the
planner-stats family (join_card_est, selectivity_est, layout_advisor,
partition_quality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

_SIZES = ["n0", "n1", "n2", "n3"]
_EDGES = {(0, 1): "e01", (1, 2): "e12", (2, 3): "e23"}
_INTERVALS = [(i, j) for L in range(1, 5) for i in range(0, 5 - L) for j in [i + L - 1]]


def _dp_exprs() -> dict[str, str]:
    """Ordered name → expression text (uses ``{IDIV}`` as the integer
    floor-division placeholder; every name references only stats
    columns or previously defined names)."""
    ex: dict[str, str] = {}
    ex["e01"] = "greatest(d_c_cust, d_o_cust)"
    ex["e12"] = "greatest(d_o_ord, d_l_ord)"
    ex["e23"] = "greatest(d_l_supp, d_s_supp)"
    for i, j in _INTERVALS:
        if i == j:
            ex[f"card_{i}_{j}"] = _SIZES[i]
        else:
            ex[f"card_{i}_{j}"] = (
                f"((card_{i}_{j - 1}) * {_SIZES[j]}) {{IDIV}} "
                f"{_EDGES[(j - 1, j)]}"
            )
    for i in range(4):
        ex[f"cost_{i}_{i}"] = "CAST(0 AS BIGINT)"
        ex[f"split_{i}_{i}"] = "CAST(-1 AS BIGINT)"
    for i, j in _INTERVALS:
        if i == j:
            continue
        terms = [f"(cost_{i}_{s} + cost_{s + 1}_{j})" for s in range(i, j)]
        mc = terms[0] if len(terms) == 1 else f"least({', '.join(terms)})"
        ex[f"mincost_{i}_{j}"] = mc
        ex[f"cost_{i}_{j}"] = f"mincost_{i}_{j} + card_{i}_{j}"
        cases = " ".join(
            f"WHEN (cost_{i}_{s} + cost_{s + 1}_{j}) = mincost_{i}_{j} "
            f"THEN CAST({s} AS BIGINT)"
            for s in range(i, j)
        )
        ex[f"split_{i}_{j}"] = f"CASE {cases} END"
    return ex


def q_join_order_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selinger DP table over the 4-relation chain (module doc):
    (lo, hi, est_card, best_cost, best_split)."""
    c = table(spark, sf_dir, "customer").agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.count_distinct("c_custkey").cast("long").alias("d_c_cust"),
    )
    o = table(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).cast("long").alias("n1"),
        F.count_distinct("o_custkey").cast("long").alias("d_o_cust"),
        F.count_distinct("o_orderkey").cast("long").alias("d_o_ord"),
    )
    li = table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).cast("long").alias("n2"),
        F.count_distinct("l_orderkey").cast("long").alias("d_l_ord"),
        F.count_distinct("l_suppkey").cast("long").alias("d_l_supp"),
    )
    s = table(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).cast("long").alias("n3"),
        F.count_distinct("s_suppkey").cast("long").alias("d_s_supp"),
    )
    piv = c.crossJoin(o).crossJoin(li).crossJoin(s)
    for name, text in _dp_exprs().items():
        piv = piv.withColumn(name, F.expr(text.format(IDIV="div")))
    rows = ", ".join(
        f"CAST({i} AS BIGINT), CAST({j} AS BIGINT), card_{i}_{j}, "
        f"cost_{i}_{j}, split_{i}_{j}"
        for i, j in _INTERVALS
    )
    return piv.select(
        F.expr(
            f"stack({len(_INTERVALS)}, {rows}) AS "
            "(lo, hi, est_card, best_cost, best_split)"
        )
    ).orderBy("lo", "hi")


def _joinorder_sql() -> str:
    stats = """
stats AS (
    SELECT (SELECT count(*)::BIGINT FROM customer) AS n0,
           (SELECT count(DISTINCT c_custkey)::BIGINT FROM customer) AS d_c_cust,
           (SELECT count(*)::BIGINT FROM orders) AS n1,
           (SELECT count(DISTINCT o_custkey)::BIGINT FROM orders) AS d_o_cust,
           (SELECT count(DISTINCT o_orderkey)::BIGINT FROM orders) AS d_o_ord,
           (SELECT count(*)::BIGINT FROM lineitem) AS n2,
           (SELECT count(DISTINCT l_orderkey)::BIGINT FROM lineitem) AS d_l_ord,
           (SELECT count(DISTINCT l_suppkey)::BIGINT FROM lineitem) AS d_l_supp,
           (SELECT count(*)::BIGINT FROM supplier) AS n3,
           (SELECT count(DISTINCT s_suppkey)::BIGINT FROM supplier) AS d_s_supp
)"""
    layers = [stats]
    prev = "stats"
    for k, (name, text) in enumerate(_dp_exprs().items()):
        cur = f"l{k}"
        layers.append(
            f"{cur} AS (SELECT *, {text.format(IDIV='//')} AS {name} "
            f"FROM {prev})"
        )
        prev = cur
    selects = " UNION ALL ".join(
        f"SELECT {i}::BIGINT AS lo, {j}::BIGINT AS hi, "
        f"card_{i}_{j}::BIGINT AS est_card, cost_{i}_{j}::BIGINT AS best_cost, "
        f"split_{i}_{j}::BIGINT AS best_split FROM {prev}"
        for i, j in _INTERVALS
    )
    return (
        "WITH " + ",\n".join(layers) + "\n" + selects + "\nORDER BY lo, hi"
    )


QUERIES = {"join_order_dp": q_join_order_dp}

ORACLES = {"join_order_dp": _joinorder_sql()}
