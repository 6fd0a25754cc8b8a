"""Platform governance, batch 132: materialized-view selection under a
storage budget with interaction-exact subset enumeration, and a
fairness audit (demographic parity + equalized-odds components) of the
centroid classifier — the warehouse-planner and the ML-governance
readouts.

Scale design (100 TB):
- ``mv_select``: candidate MV sizes (group counts) and the per-query
  rows-saved benefits come from FIVE 1-row/k-row aggregates over
  orders (the allowlisted stats tier); the chooser then enumerates all
  2⁵ = 32 subsets as a LITERAL panel crossed with the one-row stats
  pivot — benefit(S) = Σ_q freq_q · max_{m∈S∩answers(q)} saved(q, m),
  which a greedy/additive model gets WRONG when two MVs answer the
  same query; the exact enumeration is metadata-sized by construction.
  Output: every feasible subset ranked, so the argmax and its margin
  are both visible.
- ``fairness_audit``: rides noiseops.predictions (shared centroid
  classifier, broadcast ≤10-row centroid cross); groups are
  vec_id % 3, the positive class is label < 5. Per group: base rate,
  predicted-positive rate, TPR, FPR — all exact-integer milli floors
  from ONE keyed aggregate; the demographic-parity gap and the TPR gap
  (equalized-odds component) ride a 3-row rollup.

Reference parity: no governance layer in the reference; completes the
planner family (layout_advisor, join_order_dp, selectivity_est) and
the eval family (auc_roc, calibration_bins, label_noise_est).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .noiseops import PRED_SQL, predictions
from .util import table

# candidate MVs over orders: name -> distinct-count expression (rows the
# MV stores). Benefits below say which queries each MV can answer.
MV_NAMES = ["m_year", "m_month", "m_status", "m_prio", "m_cust"]
# workload: (query id, frequency, [(mv index answering it)])
MV_WORKLOAD = [
    (1, 10, [0, 1]),  # yearly revenue: year or (year,month) MV
    (2, 6, [1]),  # monthly revenue: only (year,month)
    (3, 8, [2]),  # status rollup
    (4, 4, [3]),  # priority rollup
    (5, 2, [4]),  # customer-bucket rollup
    (6, 5, [0, 1, 2]),  # status×year drill (any of these prunes)
]
MV_BUDGET = 120  # stored-row budget


def q_mv_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All feasible MV subsets ranked by interaction-exact benefit
    (module doc): (mask, storage_rows, benefit_rows, is_best)."""
    o = table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    mo = F.month("o_orderdate")
    sizes = o.agg(
        F.count(F.lit(1)).alias("base_rows"),
        F.count_distinct(yr).alias("sz0"),
        F.count_distinct(yr * 100 + mo).alias("sz1"),
        F.count_distinct("o_orderstatus").alias("sz2"),
        F.count_distinct("o_orderpriority").alias("sz3"),
        F.count_distinct(F.col("o_custkey") % 100).alias("sz4"),
    )
    masks = spark.createDataFrame(
        [(m,) for m in range(1 << len(MV_NAMES))], "mask long"
    )
    j = masks.crossJoin(F.broadcast(sizes))
    storage = None
    for i in range(len(MV_NAMES)):
        t = F.when(
            F.shiftright(F.col("mask"), i).bitwiseAND(1) == 1, F.col(f"sz{i}")
        ).otherwise(0)
        storage = t if storage is None else storage + t
    benefit = None
    for qid, freq, answers in MV_WORKLOAD:
        best = None
        for i in answers:
            saved = F.when(
                F.shiftright(F.col("mask"), i).bitwiseAND(1) == 1,
                F.col("base_rows") - F.col(f"sz{i}"),
            ).otherwise(0)
            best = saved if best is None else F.greatest(best, saved)
        t = F.lit(freq) * best
        benefit = t if benefit is None else benefit + t
    st = j.select(
        "mask",
        storage.cast("long").alias("storage_rows"),
        benefit.cast("long").alias("benefit_rows"),
    ).filter(F.col("storage_rows") <= MV_BUDGET)
    best = st.agg(
        F.max(
            F.struct(
                F.col("benefit_rows").alias("b"),
                (-F.col("mask")).alias("nm"),
            )
        ).alias("m")
    ).select((-F.col("m.nm")).alias("bm"))
    return (
        st.crossJoin(F.broadcast(best))
        .select(
            "mask",
            "storage_rows",
            "benefit_rows",
            ((F.col("mask") == F.col("bm"))).cast("long").alias("is_best"),
        )
        .orderBy(F.desc("benefit_rows"), F.asc("mask"))
    )


def _mv_sql() -> str:
    storage = " + ".join(
        f"CASE WHEN (mask >> {i}) & 1 = 1 THEN sz{i} ELSE 0 END"
        for i in range(len(MV_NAMES))
    )
    benefits = []
    for qid, freq, answers in MV_WORKLOAD:
        terms = ", ".join(
            f"CASE WHEN (mask >> {i}) & 1 = 1 THEN base_rows - sz{i} "
            "ELSE 0 END"
            for i in answers
        )
        g = terms if len(answers) == 1 else f"greatest({terms})"
        benefits.append(f"{freq} * ({g})")
    benefit = " + ".join(benefits)
    return f"""
WITH sizes AS (
    SELECT count(*)::BIGINT AS base_rows,
           count(DISTINCT year(o_orderdate))::BIGINT AS sz0,
           count(DISTINCT year(o_orderdate) * 100
                 + month(o_orderdate))::BIGINT AS sz1,
           count(DISTINCT o_orderstatus)::BIGINT AS sz2,
           count(DISTINCT o_orderpriority)::BIGINT AS sz3,
           count(DISTINCT o_custkey % 100)::BIGINT AS sz4
    FROM orders
),
masks AS (
    SELECT unnest(generate_series(0, {(1 << len(MV_NAMES)) - 1}))::BIGINT
        AS mask
),
st AS (
    SELECT mask, ({storage})::BIGINT AS storage_rows,
           ({benefit})::BIGINT AS benefit_rows
    FROM masks CROSS JOIN sizes
    WHERE ({storage}) <= {MV_BUDGET}
),
best AS (
    SELECT max(struct_pack(b := benefit_rows, nm := -mask)) AS m FROM st
)
SELECT mask, storage_rows, benefit_rows,
       (CASE WHEN mask = -(SELECT m.nm FROM best) THEN 1 ELSE 0 END)::BIGINT
           AS is_best
FROM st
ORDER BY benefit_rows DESC, mask ASC
"""


FA_GROUPS = 3  # group = vec_id % FA_GROUPS
FA_POS = 5  # positive class: label < FA_POS


def q_fairness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group parity/odds metrics + gaps (module doc)."""
    pred = predictions(spark, sf_dir)
    rows = pred.select(
        (F.col("vec_id") % FA_GROUPS).alias("grp"),
        (F.col("given") < FA_POS).cast("long").alias("y"),
        (F.col("pred") < FA_POS).cast("long").alias("yhat"),
    )
    per = rows.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("pos"),
        F.sum("yhat").alias("ppos"),
        F.sum(F.col("y") * F.col("yhat")).alias("tp"),
        F.sum((1 - F.col("y")) * F.col("yhat")).alias("fp"),
    )
    per = per.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        F.expr("cast(pos * 1000 div n as bigint)").alias("base_milli"),
        F.expr("cast(ppos * 1000 div n as bigint)").alias("pp_rate_milli"),
        F.expr("cast(tp * 1000 div greatest(pos, 1) as bigint)").alias(
            "tpr_milli"
        ),
        F.expr(
            "cast(fp * 1000 div greatest(n - pos, 1) as bigint)"
        ).alias("fpr_milli"),
    )
    gaps = per.agg(
        (F.max("pp_rate_milli") - F.min("pp_rate_milli")).alias("parity_gap"),
        (F.max("tpr_milli") - F.min("tpr_milli")).alias("tpr_gap"),
    )
    return (
        per.crossJoin(F.broadcast(gaps))
        .select(
            "grp",
            "n",
            "base_milli",
            "pp_rate_milli",
            "tpr_milli",
            "fpr_milli",
            F.col("parity_gap").cast("long").alias("parity_gap_milli"),
            F.col("tpr_gap").cast("long").alias("tpr_gap_milli"),
        )
        .orderBy("grp")
    )


_FA_SQL = f"""
WITH pred AS ({PRED_SQL}),
rows_ AS (
    SELECT (vec_id % {FA_GROUPS})::BIGINT AS grp,
           (CASE WHEN given < {FA_POS} THEN 1 ELSE 0 END)::BIGINT AS y,
           (CASE WHEN pred < {FA_POS} THEN 1 ELSE 0 END)::BIGINT AS yhat
    FROM pred
),
per AS (
    SELECT grp, count(*)::BIGINT AS n,
           (sum(y) * 1000 // count(*))::BIGINT AS base_milli,
           (sum(yhat) * 1000 // count(*))::BIGINT AS pp_rate_milli,
           (sum(y * yhat) * 1000 // greatest(sum(y), 1))::BIGINT AS tpr_milli,
           (sum((1 - y) * yhat) * 1000
            // greatest(count(*) - sum(y), 1))::BIGINT AS fpr_milli
    FROM rows_ GROUP BY grp
),
gaps AS (
    SELECT (max(pp_rate_milli) - min(pp_rate_milli))::BIGINT AS parity_gap,
           (max(tpr_milli) - min(tpr_milli))::BIGINT AS tpr_gap
    FROM per
)
SELECT p.grp, p.n, p.base_milli, p.pp_rate_milli, p.tpr_milli, p.fpr_milli,
       g.parity_gap AS parity_gap_milli, g.tpr_gap AS tpr_gap_milli
FROM per p CROSS JOIN gaps g
ORDER BY p.grp
"""


QUERIES = {
    "mv_select": q_mv_select,
    "fairness_audit": q_fairness_audit,
}

ORACLES = {
    "mv_select": _mv_sql(),
    "fairness_audit": _FA_SQL,
}
