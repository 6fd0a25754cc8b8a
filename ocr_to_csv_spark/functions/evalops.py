"""Model-evaluation operators, batch 65: classifier confusion matrix
and the decile gains/lift table.

Scale design (100 TB):
- ``lang_confusion``: full confusion matrix of the in-repo ``lang_id``
  classifier against the labeled ``documents.lang`` column — the eval
  every curation pipeline runs before trusting a filter. COMPOSES the
  already-oracle-checked classifier (its exact expression is reused on
  both sides, the ``cohens_kappa`` precedent). Plan: one map-side
  prediction projection → one (label, pred) groupBy → two tiny
  keyed joins for row/column totals. Per-cell row-share (recall on the
  diagonal) and column-share (precision on the diagonal) are single
  IEEE divisions of exact counts. Matrix size is |langs|² — constant —
  so everything after the first aggregate is broadcast-sized.
- ``gains_table``: the campaign-targeting gains/lift table — rank
  customers by a model score (account balance in exact cents as the
  propensity proxy), cut into NTILE_BUCKETS deciles, and report per
  decile the positives captured (customer placed ≥1 URGENT order),
  cumulative capture share, and lift, all as exact integer
  numerators + one division each. Ties broken deterministically by
  (score desc, custkey) so both engines assign identical deciles. The
  ntile window is a global sort at sandbox scale; at 10^12 rows the
  same table comes from distributed quantile boundaries
  (``equidepth_hist``'s plan) + a broadcast bucket join — documented,
  shape unchanged. Gains tables are computed on eval samples, not the
  full catalog, so the global window is also honest in practice.

Reference parity: no eval layer in the reference; extends the metric
family (``auc_roc``, ``calibration_bins``, ``pr_at_k``, ``ndcg``,
``cohens_kappa``, ``cluster_purity``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .textops import ORACLES as _TEXT_ORACLES
from .textops import q_lang_id
from .util import table

NTILE_BUCKETS = 10


def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of lang_id vs the labeled lang column."""
    pred = q_lang_id(spark, sf_dir)
    cells = pred.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_tot = cells.groupBy("lang").agg(F.sum("n").alias("true_tot"))
    col_tot = cells.groupBy("lang_pred").agg(F.sum("n").alias("pred_tot"))
    out = cells.join(row_tot, "lang").join(col_tot, "lang_pred")
    return out.select(
        "lang",
        "lang_pred",
        "n",
        "true_tot",
        "pred_tot",
        (F.col("lang") == F.col("lang_pred")).cast("long").alias("is_diag"),
        (F.col("n").cast("double") / F.col("true_tot").cast("double")).alias(
            "row_share"
        ),
        (F.col("n").cast("double") / F.col("pred_tot").cast("double")).alias(
            "col_share"
        ),
    ).orderBy("lang", "lang_pred")


_CONFUSION_SQL = f"""
WITH pred AS ({_TEXT_ORACLES["lang_id"]}),
cells AS (
    SELECT lang, lang_pred, COUNT(*) AS n FROM pred GROUP BY 1, 2
),
row_tot AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS true_tot
            FROM cells GROUP BY lang),
col_tot AS (SELECT lang_pred, CAST(SUM(n) AS BIGINT) AS pred_tot
            FROM cells GROUP BY lang_pred)
SELECT c.lang, c.lang_pred, c.n, r.true_tot, p.pred_tot,
       CAST(c.lang = c.lang_pred AS BIGINT) AS is_diag,
       CAST(c.n AS DOUBLE) / CAST(r.true_tot AS DOUBLE) AS row_share,
       CAST(c.n AS DOUBLE) / CAST(p.pred_tot AS DOUBLE) AS col_share
FROM cells c
JOIN row_tot r ON r.lang = c.lang
JOIN col_tot p ON p.lang_pred = c.lang_pred
ORDER BY c.lang, c.lang_pred
"""


def q_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains/lift table (see module docstring)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    pos = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("is_pos", F.lit(1))
    )
    scored = cust.select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("score_cents"),
    ).join(pos, "c_custkey", "left").withColumn(
        "is_pos", F.coalesce(F.col("is_pos"), F.lit(0)).cast("long")
    )
    ranked = scored.withColumn(
        "decile",
        F.ntile(NTILE_BUCKETS).over(
            Window.orderBy(F.desc("score_cents"), F.asc("c_custkey"))
        ).cast("long"),
    )
    per = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("is_pos").alias("pos"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    out = per.select(
        "decile",
        "n",
        "pos",
        F.sum("pos").over(w).alias("cum_pos"),
        F.sum("pos").over(tot).alias("total_pos"),
        F.sum("n").over(tot).alias("total_n"),
    )
    return out.select(
        "decile",
        "n",
        "pos",
        "cum_pos",
        "total_pos",
        (
            F.col("cum_pos").cast("double") / F.col("total_pos").cast("double")
        ).alias("capture"),
        (
            (F.col("pos") * F.col("total_n")).cast("double")
            / (F.col("n") * F.col("total_pos")).cast("double")
        ).alias("lift"),
    ).orderBy("decile")


_GAINS_SQL = f"""
WITH pos AS (
    SELECT DISTINCT o_custkey AS c_custkey, 1 AS is_pos
    FROM orders WHERE o_orderpriority = '1-URGENT'
),
scored AS (
    SELECT c.c_custkey,
           CAST(round(c.c_acctbal * 100) AS BIGINT) AS score_cents,
           CAST(COALESCE(p.is_pos, 0) AS BIGINT) AS is_pos
    FROM customer c LEFT JOIN pos p ON p.c_custkey = c.c_custkey
),
ranked AS (
    SELECT *, CAST(ntile({NTILE_BUCKETS}) OVER (
        ORDER BY score_cents DESC, c_custkey ASC) AS BIGINT) AS decile
    FROM scored
),
per AS (
    SELECT decile, COUNT(*) AS n, CAST(SUM(is_pos) AS BIGINT) AS pos
    FROM ranked GROUP BY decile
),
acc AS (
    SELECT decile, n, pos,
           CAST(SUM(pos) OVER (ORDER BY decile
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
           CAST(SUM(pos) OVER () AS BIGINT) AS total_pos,
           CAST(SUM(n) OVER () AS BIGINT) AS total_n
    FROM per
)
SELECT decile, n, pos, cum_pos, total_pos,
       CAST(cum_pos AS DOUBLE) / CAST(total_pos AS DOUBLE) AS capture,
       CAST(pos * total_n AS DOUBLE)
           / CAST(n * total_pos AS DOUBLE) AS lift
FROM acc
ORDER BY decile
"""


QUERIES = {
    "lang_confusion": q_lang_confusion,
    "gains_table": q_gains_table,
}

ORACLES = {
    "lang_confusion": _CONFUSION_SQL,
    "gains_table": _GAINS_SQL,
}
