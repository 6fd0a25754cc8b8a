"""Calibration + uncertainty, batch 157: Platt scaling by exact grid
search and a split-conformal prediction interval with its coverage
audit — the probability-calibration step after brier_decomp and the
distribution-free uncertainty quantification modern ML pipelines bolt
onto any point predictor.

Scale design (100 TB):
- ``platt_grid``: the 18-candidate (a, b) sigmoid panel (milli-scaled
  literals) is evaluated by ONE conditional aggregate — per candidate
  the logistic loss Σ ln(1+exp(−y·z)) accumulates ln terms leaf-
  rounded to INTEGER nano (heldout_ppl discipline), so the winner is
  a packed-key least over exact int64 columns. The quantile_fit /
  synth_control exact-grid tier, applied to calibration.
- ``conformal_interval``: the predictor (OLS of n_chars on n_tokens)
  is fit on the even-doc_id calibration half with exact integer
  moments; residual scores stay EXACT integers by clearing the
  rational prediction to the common denominator
  (score = |den·y − (num_a·x + num_b)|). The conformal quantile is
  the k = ⌈(n_cal+1)·0.9⌉-th smallest score — an exact order
  statistic via the distinct-value cumulative-count window (the
  mann_whitney rank discipline, never a row sort) — and the held-out
  coverage count on the odd half is the audit; the marginal-coverage
  guarantee (≥ 0.9 up to discretization) is pinned in the test.

Reference parity: no calibration layer in the reference; extends
brier_decomp, calibration_bins, quantile_fit, ols_fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .textops import QC_BIAS, QC_BUCKETS, _QC_W, _qc_weight
from .util import DUCK_TOKENS, hex32, table, tokens

NANO = 1_000_000_000
PLATT_A = (-2000, -1000, -500, 500, 1000, 2000)  # milli
PLATT_B = (-1000, 0, 1000)  # milli
ALPHA_MILLI = 100  # conformal: 90% target coverage


def q_platt_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best (a, b) sigmoid calibration of the quality-classifier score
    (module doc): one row (n, a_milli, b_milli, loss_nano)."""
    d = table(spark, sf_dir, "documents", spread=True)
    toks = tokens(F.col("text"))
    score = F.aggregate(
        F.transform(toks, lambda t: _qc_weight(hex32(t) % QC_BUCKETS)),
        F.lit(QC_BIAS).cast("long"),
        lambda acc, x: acc + x,
    )
    base = d.select(
        score.alias("s"),
        F.when(F.col("lang") == "en", F.lit(1.0)).otherwise(
            F.lit(-1.0)
        ).alias("y"),
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    cands = [(a, b) for a in PLATT_A for b in PLATT_B]
    for idx, (a, b) in enumerate(cands):
        # z = (a_milli·s + b_milli·1000) / 1e6
        term = F.expr(
            f"CAST(round(ln(1 + exp(-y * (({a} * s + {b} * 1000) / 1e6)))"
            f" * {NANO}) AS BIGINT)"
        )
        aggs.append(F.sum(term).cast("long").alias(f"l_{idx}"))
    piv = base.agg(*aggs)
    best = F.least(
        *[
            F.col(f"l_{idx}") * 32 + F.lit(idx).cast("long")
            for idx in range(len(cands))
        ]
    )
    aarr = F.array(*[F.lit(a).cast("long") for a, _ in cands])
    barr = F.array(*[F.lit(b).cast("long") for _, b in cands])
    bi = (best % 32).cast("int")
    return piv.select(
        "n",
        F.element_at(aarr, bi + 1).alias("a_milli"),
        F.element_at(barr, bi + 1).alias("b_milli"),
        F.floor(best / 32).cast("long").alias("loss_nano"),
    )


def q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal interval for n_chars given n_tokens (module
    doc): one row (n_cal, n_test, k, qhat_scaled, den, n_covered,
    cov_milli)."""
    d = table(spark, sf_dir, "documents", spread=True)
    base = d.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("x"),
        F.col("n_chars").cast("long").alias("y"),
    )
    cal = base.filter(F.col("doc_id") % 2 == 0)
    test = base.filter(F.col("doc_id") % 2 == 1)
    fit = cal.agg(
        F.count(F.lit(1)).cast("long").alias("n_cal"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    ).select(
        "n_cal",
        # slope num/den and intercept num over common den
        (F.col("n_cal") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
            "anum"
        ),
        (F.col("n_cal") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
            "den"
        ),
        "sx",
        "sy",
    )
    # ŷ = (anum·x + bnum)/ (n_cal·den') ... clear to: score =
    # |den·n·y − (n·anum·x + (sy·den − anum·sx))| with den the slope
    # denominator; use bnum = sy·den − anum·sx over n·den
    fit = fit.select(
        "n_cal", "anum", "den",
        (F.col("sy") * F.col("den") - F.col("anum") * F.col("sx")).alias(
            "bnum"
        ),
    )

    def scores(df):
        return df.crossJoin(F.broadcast(fit)).select(
            "doc_id",
            F.abs(
                F.col("den") * F.col("n_cal") * F.col("y")
                - (
                    F.col("n_cal") * F.col("anum") * F.col("x")
                    + F.col("bnum")
                )
            ).cast("long").alias("r"),
            "n_cal",
        )
    # note: ŷ = (anum/den)·x + bnum/(n·den) → n·den·ŷ = n·anum·x + bnum
    cal_s = scores(cal)
    k = F.ceil(
        (F.col("n_cal") + 1) * (1000 - ALPHA_MILLI) / 1000.0
    ).cast("long")
    dv = cal_s.groupBy("r").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("r").rowsBetween(Window.unboundedPreceding, 0)
    dv = dv.withColumn("cum", F.sum("cnt").over(w))
    qhat = (
        dv.crossJoin(F.broadcast(fit.select("n_cal")))
        .filter(F.col("cum") >= k)
        .agg(F.min("r").alias("qhat"))
    )
    test_s = scores(test)
    cov = test_s.crossJoin(F.broadcast(qhat)).agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum((F.col("r") <= F.col("qhat")).cast("long"))
        .cast("long")
        .alias("n_covered"),
        F.first("qhat").alias("qhat_scaled"),
        F.first("n_cal").alias("n_cal"),
    )
    return cov.select(
        "n_cal",
        "n_test",
        F.expr(
            f"CAST(ceil((n_cal + 1) * {1000 - ALPHA_MILLI} / 1000.0) "
            "AS BIGINT)"
        ).alias("k"),
        F.col("qhat_scaled").cast("long").alias("qhat_scaled"),
        "n_covered",
        F.expr("(1000 * n_covered) div n_test").alias("cov_milli"),
    )


_TOKS = DUCK_TOKENS.format(x="text")


def _platt_sql() -> str:
    cands = [(a, b) for a in PLATT_A for b in PLATT_B]
    aggs = ["count(*)::BIGINT AS n"]
    for idx, (a, b) in enumerate(cands):
        aggs.append(
            f"sum(CAST(round(ln(1 + exp(-y * (({a} * s + {b} * 1000) "
            f"/ 1e6))) * {NANO}) AS BIGINT))::BIGINT AS l_{idx}"
        )
    best = "least(" + ", ".join(
        f"(l_{idx} * 32 + {idx})" for idx in range(len(cands))
    ) + ")"
    aarr = "[" + ", ".join(str(a) for a, _ in cands) + "]"
    barr = "[" + ", ".join(str(b) for _, b in cands) + "]"
    return f"""
WITH base AS (
    SELECT ({QC_BIAS} + coalesce(
               list_sum(list_transform({_TOKS}, t -> {_QC_W})), 0
           ))::BIGINT AS s,
           (CASE WHEN lang = 'en' THEN 1.0 ELSE -1.0 END) AS y
    FROM documents
),
piv AS (SELECT {', '.join(aggs)} FROM base)
SELECT n,
       ({aarr})[({best}) % 32 + 1]::BIGINT AS a_milli,
       ({barr})[({best}) % 32 + 1]::BIGINT AS b_milli,
       (({best}) // 32)::BIGINT AS loss_nano
FROM piv
"""


_CONF_SQL = f"""
WITH base AS (
    SELECT doc_id, len({_TOKS})::BIGINT AS x, n_chars::BIGINT AS y
    FROM documents
),
cal AS (SELECT * FROM base WHERE doc_id % 2 = 0),
tst AS (SELECT * FROM base WHERE doc_id % 2 = 1),
fit0 AS (
    SELECT count(*)::BIGINT AS n_cal, sum(x)::BIGINT AS sx,
           sum(y)::BIGINT AS sy, sum(x*y)::BIGINT AS sxy,
           sum(x*x)::BIGINT AS sxx
    FROM cal
),
fit AS (
    SELECT n_cal,
           (n_cal * sxy - sx * sy)::BIGINT AS anum,
           (n_cal * sxx - sx * sx)::BIGINT AS den,
           (sy * (n_cal * sxx - sx * sx)
            - (n_cal * sxy - sx * sy) * sx)::BIGINT AS bnum
    FROM fit0
),
cal_s AS (
    SELECT abs(den * n_cal * y - (n_cal * anum * x + bnum))::BIGINT AS r
    FROM cal, fit
),
dv AS (
    SELECT r, cnt,
           sum(cnt) OVER (ORDER BY r
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM (SELECT r, count(*)::BIGINT AS cnt FROM cal_s GROUP BY r)
),
kk AS (
    SELECT ceil((n_cal + 1) * {1000 - ALPHA_MILLI} / 1000.0)::BIGINT AS k,
           n_cal
    FROM fit
),
qh AS (
    SELECT min(r)::BIGINT AS qhat FROM dv, kk WHERE cum >= k
),
tst_s AS (
    SELECT abs(den * n_cal * y - (n_cal * anum * x + bnum))::BIGINT AS r
    FROM tst, fit
)
SELECT (SELECT n_cal FROM fit) AS n_cal,
       count(*)::BIGINT AS n_test,
       (SELECT k FROM kk) AS k,
       (SELECT qhat FROM qh) AS qhat_scaled,
       sum(CASE WHEN r <= (SELECT qhat FROM qh) THEN 1 ELSE 0 END)::BIGINT
           AS n_covered,
       ((1000 * sum(CASE WHEN r <= (SELECT qhat FROM qh) THEN 1 ELSE 0
           END)) // count(*))::BIGINT AS cov_milli
FROM tst_s
"""

QUERIES = {
    "platt_grid": q_platt_grid,
    "conformal_interval": q_conformal_interval,
}

ORACLES = {
    "platt_grid": _platt_sql(),
    "conformal_interval": _CONF_SQL,
}
