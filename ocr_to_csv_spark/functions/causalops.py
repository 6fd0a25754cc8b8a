"""Causal matching + coverage curation, batch 81: deterministic
propensity-score matching and greedy max-coverage document selection.

Scale design (100 TB):
- ``psm_match``: nearest-control-within-caliper matching WITH
  replacement — the join-friendly PSM variant (each treated unit
  matches independently, so the whole match is data-parallel; the
  without-replacement variant is the sequential auction
  ``stable_matching`` already covers). Controls collapse to DISTINCT
  scores (min key per score — deterministic representative); one
  union + ONE ordered window (last non-null control at-or-before,
  first at-or-after — the asof-join shape of ``asof_join``) gives both
  neighbors; the closer one within the caliper wins (tie: lower
  control score). No theta-join, no per-treated scan: one sort of the
  score-grain stream. At 100 TB the window range-partitions on score.
- ``max_coverage``: greedy maximum-coverage selection of K=8 docs over
  the doc-bigram incidence — the classic (1−1/e) submodular curation
  primitive (select documents that jointly cover the most distinct
  n-grams, the dedup-aware "diverse subset" selection for training
  data). Per round: one anti-join of the incidence against the covered
  set + one keyed gain count + argmax; ONLY the 1-row winner reaches
  the driver (state-sized, like kmeans' centroid sums). K rounds of
  keyed joins — the lazy-greedy distributed shape. Greedy is
  deterministic under the (gain desc, doc_id asc) tie-break, so an
  independent pure-Python greedy is the golden oracle.

Reference parity: no causal/curation-selection layer in the reference;
completes the experimentation family (ab_test, cuped, diff_in_diff)
with the observational-matching step, and the curation family
(mix_sample, dsir_weights, curriculum_order) with subset selection.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import gold_tag, table

CALIPER = 50  # max |score difference| for a valid match
K_COVER = 8


def _units(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with ≥1 order: arm = key parity (the cuped split),
    score = account balance in whole dollars (explicit floor)."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        (F.col("c_custkey") % 2).alias("arm"),
        F.floor(
            F.round(F.col("c_acctbal") * 100).cast("long") / 100
        ).cast("long").alias("score"),
    )
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    ).distinct()
    return c.join(o, "k")


_UNITS_SQL = """
    SELECT c_custkey AS k, c_custkey % 2 AS arm,
           CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT) / 100.0)
               AS BIGINT) AS score
    FROM customer
    WHERE c_custkey IN (SELECT DISTINCT o_custkey FROM orders)
"""


def q_psm_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each treated unit (arm=1) matched to the nearest control score
    within CALIPER, with replacement (module docstring). Emits
    (treated k, control k, |score gap|)."""
    u = _units(spark, sf_dir)
    ctl = (
        u.filter(F.col("arm") == 0)
        .groupBy("score")
        .agg(F.min("k").alias("ck"))
        .select(F.col("score").alias("s"), "ck")
    )
    trt = u.filter(F.col("arm") == 1).select("k", F.col("score").alias("s"))
    stream = trt.select(
        "s", F.lit(1).alias("is_t"), F.col("k").alias("tk"),
        F.lit(None).cast("long").alias("cs"), F.lit(None).cast("long").alias("ck"),
    ).unionByName(
        ctl.select(
            "s", F.lit(0).alias("is_t"), F.lit(None).cast("long").alias("tk"),
            F.col("s").alias("cs"), "ck",
        )
    )
    # ties among treated rows carry only NULL cs/ck, so ordering by
    # (s, is_t) alone is result-deterministic (no null-ordering hazard)
    fwd = Window.orderBy("s", "is_t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    bwd = Window.orderBy(F.desc("s"), F.desc("is_t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    got = (
        stream.withColumn("p_s", F.last("cs", ignorenulls=True).over(fwd))
        .withColumn("p_k", F.last("ck", ignorenulls=True).over(fwd))
        .withColumn("n_s", F.last("cs", ignorenulls=True).over(bwd))
        .withColumn("n_k", F.last("ck", ignorenulls=True).over(bwd))
        .filter(F.col("is_t") == 1)
    )
    d_prev = F.col("s") - F.col("p_s")
    d_next = F.col("n_s") - F.col("s")
    use_prev = F.col("p_s").isNotNull() & (
        F.col("n_s").isNull() | (d_prev <= d_next)
    )
    matched = got.select(
        F.col("tk").alias("treated_k"),
        F.when(use_prev, F.col("p_k")).otherwise(F.col("n_k")).alias("control_k"),
        F.when(use_prev, d_prev).otherwise(d_next).alias("gap"),
    )
    return matched.filter(
        F.col("control_k").isNotNull() & (F.col("gap") <= CALIPER)
    )


_PSM_SQL = f"""
WITH u AS ({_UNITS_SQL}),
ctl AS (
    SELECT score AS s, min(k) AS ck FROM u WHERE arm = 0 GROUP BY score
),
trt AS (SELECT k, score AS s FROM u WHERE arm = 1),
stream AS (
    SELECT s, 1 AS is_t, k AS tk, NULL::BIGINT AS cs, NULL::BIGINT AS ck
    FROM trt
    UNION ALL
    SELECT s, 0, NULL, s, ck FROM ctl
),
scanned AS (
    SELECT *,
           last_value(cs IGNORE NULLS) OVER (
               ORDER BY s, is_t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_s,
           last_value(ck IGNORE NULLS) OVER (
               ORDER BY s, is_t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_k,
           last_value(cs IGNORE NULLS) OVER (
               ORDER BY s DESC, is_t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_s,
           last_value(ck IGNORE NULLS) OVER (
               ORDER BY s DESC, is_t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_k
    FROM stream
)
SELECT tk AS treated_k,
       CASE WHEN p_s IS NOT NULL AND (n_s IS NULL OR s - p_s <= n_s - s)
            THEN p_k ELSE n_k END AS control_k,
       CASE WHEN p_s IS NOT NULL AND (n_s IS NULL OR s - p_s <= n_s - s)
            THEN s - p_s ELSE n_s - s END AS gap
FROM scanned
WHERE is_t = 1
  AND (CASE WHEN p_s IS NOT NULL AND (n_s IS NULL OR s - p_s <= n_s - s)
            THEN p_k ELSE n_k END) IS NOT NULL
  AND (CASE WHEN p_s IS NOT NULL AND (n_s IS NULL OR s - p_s <= n_s - s)
            THEN s - p_s ELSE n_s - s END) <= {CALIPER}
"""


def _doc_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    toks = F.split(F.col("text"), " ")
    bgs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(bgs).alias("bg"),
    ).distinct()


def q_max_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy K-round max-coverage selection over doc bigrams (module
    docstring). Emits (rank, doc_id, gain)."""
    inc = _doc_bigrams(spark, sf_dir).localCheckpoint()
    covered: DataFrame | None = None
    picks = []
    for rank in range(1, K_COVER + 1):
        live = inc if covered is None else inc.join(covered, "bg", "left_anti")
        best = (
            live.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("gain"))
            .agg(
                F.min(
                    F.struct(
                        (-F.col("gain")).alias("ng"),
                        F.col("doc_id").alias("d"),
                    )
                ).alias("m")
            )
            .select(F.col("m.d").alias("doc_id"), (-F.col("m.ng")).alias("gain"))
            .collect()
        )
        if not best or best[0].doc_id is None or best[0].gain == 0:
            break
        doc_id, gain = best[0].doc_id, best[0].gain
        picks.append((rank, doc_id, gain))
        new_cov = inc.filter(F.col("doc_id") == doc_id).select("bg")
        covered = (
            new_cov if covered is None else covered.unionByName(new_cov).distinct()
        ).localCheckpoint()
    return spark.createDataFrame(
        picks, "rank long, doc_id long, gain long"
    )


def _py_max_coverage(sf_dir: str) -> list[tuple[int, int, int]]:
    """Independent pure-Python greedy with the same tie-break."""
    import glob

    import pandas as pd

    files = sorted(glob.glob(f"{sf_dir}/documents.parquet")) or sorted(
        glob.glob(f"{sf_dir}/documents.parquet/*.parquet")
    )
    docs = pd.concat(
        pd.read_parquet(f, columns=["doc_id", "text"]) for f in files
    )
    inc = {}
    for _, row in docs.iterrows():
        ws = (row.text or "").split(" ")
        inc[int(row.doc_id)] = {
            f"{a} {b}" for a, b in zip(ws, ws[1:])
        }
    covered: set = set()
    out = []
    for rank in range(1, K_COVER + 1):
        best = None
        for d in sorted(inc):
            gain = len(inc[d] - covered)
            if best is None or (-gain, d) < best[0]:
                best = ((-gain, d), (d, gain))
        (_, _), (d, gain) = best
        if gain == 0:
            break
        out.append((rank, d, gain))
        covered |= inc[d]
    return out


def _staged_cover_gold(sf_dir: str | None = None) -> str:
    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )

    import pandas as pd

    tag = gold_tag(sf_dir, __name__)
    p = f"/tmp/ocr2csv_cover_gold_{tag}.parquet"
    if not os.path.exists(p):
        pd.DataFrame(
            _py_max_coverage(sf_dir), columns=["rank", "doc_id", "gain"]
        ).to_parquet(p, index=False)
    return p


def _cover_oracle_sql(sf_dir: str | None = None) -> str:
    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    gold = _staged_cover_gold(sf_dir)
    return f"""
        SELECT rank::BIGINT AS rank, doc_id::BIGINT AS doc_id,
               gain::BIGINT AS gain
        FROM '{gold}'
    """


QUERIES = {
    "psm_match": q_psm_match,
    "max_coverage": q_max_coverage,
}

ORACLES = {
    "psm_match": _PSM_SQL,
    "max_coverage": _cover_oracle_sql(),
}
