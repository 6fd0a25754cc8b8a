"""Statistical-test operators, batch 82: one-way ANOVA F, Cramér's V
effect size, and McNemar's paired test — completing the classical
test family (t/CUPED, KS, chi², kappa, Kendall, Mann-Kendall).

Scale design (100 TB):
- ``anova_f``: one-way ANOVA of order value across the FIVE order
  priorities. The scan collapses to 11 exact BIGINT moments in ONE
  conditional aggregate (per-group n and sum via sum(CASE), plus the
  global sum of squares) — a single map-side-partial HashAggregate to
  one row; the group count is FIXED and known, so SSB/SSW/F are a
  WRITTEN-OUT left-to-right IEEE expression over those exact integers,
  evaluated identically by both engines (no fold-order hazard, no
  libm). Group values use floor(dollars) so the global Σv² stays
  within int64 through sf10 (≤6e5² ≈ 3.6e11 per row).
- ``cramers_v``: effect size over the seg×prio contingency of
  ``chi2_cells`` (plan reused): per-cell exact BIGINT deviation
  dev = obs·N − row·col gives the cell term dev²/(N·row·col) — one
  IEEE division chain over exact ints — and the 25-cell χ² sum is a
  SORTED FOLD (Spark ``F.aggregate`` over ``sort_array(collect_list)``
  == DuckDB ``list_reduce(list_prepend(0, list_sort(list)))``), the
  repo's standard bit-deterministic float-sum device. V =
  sqrt(χ²/(N·min(r−1,c−1))); sqrt is correctly rounded per IEEE-754,
  so cross-engine bit-identical. Contingency is category²-sized (25
  rows); nothing beyond the base groupBy crosses a shuffle.
- ``mcnemar``: paired-classifier disagreement test over the SAME two
  in-repo document classifiers ``cohens_kappa`` compares (quality band
  vs gopher keep — matchops.py:78): one doc-keyed join, one 4-cell
  conditional aggregate, then the exact-rational statistic — numerator
  (n10−n01)² and continuity-corrected (|n10−n01|−1)², denominator
  n10+n01 — all BIGINT, zero floats. The doc join partitions on
  doc_id; at 10^12 docs it is one co-partitioned SortMergeJoin.

Reference parity: no stats layer in the reference (SURVEY §2); these
extend the experimentation/DQ surface the way a curation pipeline
gates classifier swaps (McNemar) and audits categorical drift
(Cramér's V) before training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

# the five TPC-H order priorities, fixed and ordered — the ANOVA groups
PRIORITIES = [
    "1-URGENT",
    "2-HIGH",
    "3-MEDIUM",
    "4-NOT SPECIFIED",
    "5-LOW",
]
K_GROUPS = len(PRIORITIES)


def q_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F of floor(o_totalprice) across the 5 order
    priorities: one conditional aggregate to 11 exact BIGINT moments,
    then SSB/SSW/F as a fixed-order IEEE expression (module docstring).
    Emits one row (n_total, k_groups, ss_between, ss_within, f_stat).
    """
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.floor(F.col("o_totalprice")).cast("long").alias("v"),
    )
    aggs = []
    for i, p in enumerate(PRIORITIES, start=1):
        is_p = (F.col("prio") == p).cast("long")
        aggs.append(F.sum(is_p).alias(f"n{i}"))
        aggs.append(F.sum(is_p * F.col("v")).alias(f"s{i}"))
    aggs.append(F.count(F.lit(1)).alias("n_total"))
    aggs.append(F.sum(F.col("v") * F.col("v")).alias("q_total"))
    m = o.agg(*aggs)

    # fixed left-to-right group-term sum: s1²/n1 + s2²/n2 + ... (doubles)
    term = None
    for i in range(1, K_GROUPS + 1):
        t = (
            F.col(f"s{i}").cast("double")
            * F.col(f"s{i}").cast("double")
            / F.col(f"n{i}").cast("double")
        )
        term = t if term is None else term + t
    nd = F.col("n_total").cast("double")
    grand = F.col("s_all").cast("double") * F.col("s_all").cast("double") / nd
    ssb = (F.col("grp_term") - grand).alias("ss_between")
    ssw = (F.col("q_total").cast("double") - F.col("grp_term")).alias(
        "ss_within"
    )
    f_stat = (
        (F.col("ss_between") / F.lit(float(K_GROUPS - 1)))
        / (F.col("ss_within") / (nd - F.lit(float(K_GROUPS))))
    ).alias("f_stat")
    return (
        m.withColumn(
            "s_all",
            sum(F.col(f"s{i}") for i in range(2, K_GROUPS + 1)) + F.col("s1"),
        )
        .withColumn("grp_term", term)
        .select("n_total", F.lit(K_GROUPS).cast("long").alias("k_groups"),
                ssb, ssw)
        .withColumn("f_stat", f_stat)
    )


def _anova_sql() -> str:
    n_cases = ",\n           ".join(
        f"sum(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END)"
        f"::BIGINT AS n{i}"
        for i, p in enumerate(PRIORITIES, start=1)
    )
    s_cases = ",\n           ".join(
        f"sum(CASE WHEN o_orderpriority = '{p}' THEN v ELSE 0 END)"
        f"::BIGINT AS s{i}"
        for i, p in enumerate(PRIORITIES, start=1)
    )
    grp_term = " + ".join(
        f"CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE) / CAST(n{i} AS DOUBLE)"
        for i in range(1, K_GROUPS + 1)
    )
    s_all = " + ".join(f"s{i}" for i in [2, 3, 4, 5]) + " + s1"
    k = K_GROUPS
    return f"""
WITH vals AS (
    SELECT o_orderpriority, CAST(floor(o_totalprice) AS BIGINT) AS v
    FROM orders
),
m AS (
    SELECT {n_cases},
           {s_cases},
           count(*)::BIGINT AS n_total,
           sum(v * v)::BIGINT AS q_total
    FROM vals
),
e AS (
    SELECT n_total, ({grp_term}) AS grp_term,
           ({s_all})::BIGINT AS s_all, q_total
    FROM m
),
d AS (
    SELECT n_total,
           grp_term - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
               / CAST(n_total AS DOUBLE) AS ss_between,
           CAST(q_total AS DOUBLE) - grp_term AS ss_within
    FROM e
)
SELECT n_total, {k}::BIGINT AS k_groups, ss_between, ss_within,
       (ss_between / CAST({k - 1} AS DOUBLE))
       / (ss_within / (CAST(n_total AS DOUBLE) - CAST({k} AS DOUBLE)))
           AS f_stat
FROM d
"""


def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V of the seg×prio contingency, built on chi2_cells'
    exact per-cell deviations; sorted-fold χ² sum (module docstring).
    Emits one row (n_total, n_rows, n_cols, chi2, cramers_v)."""
    from .statsops2 import q_chi2_cells

    cells = q_chi2_cells(spark, sf_dir)
    term = (
        F.col("dev_sq").cast("double")
        / (
            F.col("n_total").cast("double")
            * F.col("row_tot").cast("double")
            * F.col("col_tot").cast("double")
        )
    ).alias("term")
    folded = cells.select(
        "n_total", "seg", "prio", term
    ).agg(
        F.max("n_total").alias("n_total"),
        F.countDistinct("seg").alias("n_rows"),
        F.countDistinct("prio").alias("n_cols"),
        F.aggregate(
            F.sort_array(F.collect_list("term")),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("chi2"),
    )
    return folded.select(
        "n_total", "n_rows", "n_cols", "chi2",
        F.sqrt(
            F.col("chi2")
            / (
                F.col("n_total").cast("double")
                * F.least(
                    F.col("n_rows") - 1, F.col("n_cols") - 1
                ).cast("double")
            )
        ).alias("cramers_v"),
    )


def _cramers_sql() -> str:
    from .statsops2 import _CHI2_SQL

    return f"""
WITH cells AS ({_CHI2_SQL}),
terms AS (
    SELECT n_total, seg, prio,
           CAST(dev_sq AS DOUBLE)
           / (CAST(n_total AS DOUBLE) * CAST(row_tot AS DOUBLE)
              * CAST(col_tot AS DOUBLE)) AS term
    FROM cells
),
folded AS (
    SELECT max(n_total)::BIGINT AS n_total,
           count(DISTINCT seg)::BIGINT AS n_rows,
           count(DISTINCT prio)::BIGINT AS n_cols,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                    list_sort(list(term))),
                       (a, b) -> a + b) AS chi2
    FROM terms
)
SELECT n_total, n_rows, n_cols, chi2,
       sqrt(chi2 / (CAST(n_total AS DOUBLE)
                    * CAST(least(n_rows - 1, n_cols - 1) AS DOUBLE)))
           AS cramers_v
FROM folded
"""


def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test between the two document keep-classifiers
    of ``cohens_kappa`` — exact-rational statistic over the discordant
    counts (module docstring). Emits one row
    (n11, n10, n01, n00, stat_num, stat_cc_num, stat_den)."""
    from .curation8 import q_gopher_quality
    from .textops import q_quality_score

    a = q_quality_score(spark, sf_dir).select(
        "doc_id", (F.col("band") == "keep").cast("int").alias("a")
    )
    b = q_gopher_quality(spark, sf_dir).select(
        "doc_id", F.col("keep").cast("int").alias("b")
    )
    agg = a.join(b, "doc_id").agg(
        F.sum(F.col("a") * F.col("b")).alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).alias("n00"),
    )
    d = F.col("n10") - F.col("n01")
    cc = F.abs(d) - 1
    return agg.select(
        "n11", "n10", "n01", "n00",
        (d * d).alias("stat_num"),
        # continuity correction clamps at 0 when |b-c| < 1
        F.when(F.abs(d) > 0, cc * cc).otherwise(F.lit(0)).cast("long")
        .alias("stat_cc_num"),
        (F.col("n10") + F.col("n01")).alias("stat_den"),
    )


def _mcnemar_sql() -> str:
    from .curation8 import ORACLES as C8_ORACLES
    from .textops import ORACLES as TX_ORACLES

    return f"""
WITH qa AS ({TX_ORACLES["quality_score"]}),
qb AS ({C8_ORACLES["gopher_quality"]}),
j AS (
    SELECT CASE WHEN qa.band = 'keep' THEN 1 ELSE 0 END AS a,
           qb.keep AS b
    FROM qa JOIN qb USING (doc_id)
),
c AS (
    SELECT sum(a * b) AS n11, sum(a * (1 - b)) AS n10,
           sum((1 - a) * b) AS n01, sum((1 - a) * (1 - b)) AS n00
    FROM j
)
SELECT n11::BIGINT AS n11, n10::BIGINT AS n10,
       n01::BIGINT AS n01, n00::BIGINT AS n00,
       ((n10 - n01) * (n10 - n01))::BIGINT AS stat_num,
       (CASE WHEN abs(n10 - n01) > 0
             THEN (abs(n10 - n01) - 1) * (abs(n10 - n01) - 1)
             ELSE 0 END)::BIGINT AS stat_cc_num,
       (n10 + n01)::BIGINT AS stat_den
FROM c
"""


QUERIES = {
    "anova_f": q_anova_f,
    "cramers_v": q_cramers_v,
    "mcnemar": q_mcnemar,
}

ORACLES = {
    "anova_f": _anova_sql(),
    "cramers_v": _cramers_sql(),
    "mcnemar": _mcnemar_sql(),
}
