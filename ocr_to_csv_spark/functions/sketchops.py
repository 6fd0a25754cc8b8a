"""Mergeable frequency sketches, batch 42: Count-Min token frequency
estimation and the AMS (Alon-Matias-Szegedy) second-moment sign sketch.

Scale design (100 TB):
- ``cms_freq`` (Count-Min sketch, Cormode & Muthukrishnan): a D×W
  counter grid where cell (j, h_j(t) % W) accumulates token t's count.
  The sketch is LINEAR — per-partition sketches sum cell-wise, so at
  10^12 docs it is one map-side aggregate into D*W=256 integers, no
  per-token state crosses the shuffle after the initial token count.
  Point query = min over the D counters the token hashes to, an
  over-estimate by construction (collisions only ever ADD). The query
  emits the exact count alongside the estimate so the gate checks both
  the sketch arithmetic and the ≥ invariant. Here the sketch is built
  from the exact token-count table (one token-keyed shuffle) so the
  oracle is deterministic; the production variant folds raw partitions
  straight into the grid and never shuffles tokens at all.
- ``ams_f2`` (AMS sign sketch): K independent ±1 hash signs s_j(t);
  S_j = Σ_t s_j(t)·f_t is a single map-side sum, and S_j² is an
  unbiased estimator of F2 = Σ f_t² — the self-join size, THE number a
  planner needs to predict shuffle-join blowup and key skew before
  running the join (complements ``join_card_est``'s bucket histogram:
  AMS is O(K) state instead of O(W) and unbiased instead of
  upper-bound). All integer arithmetic (signs, counts, squares); the
  only float is the final /K, a power-of-two division that is exact in
  IEEE doubles on both engines.

Reference parity: the reference has no sketch layer; these extend the
optimizer-statistics surface like ``analytics2.join_card_est``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import DUCK_HEX32, DUCK_TOKENS, hex32, table, tokens

CMS_D = 4  # sketch depth (independent hash rows)
CMS_W = 64  # sketch width (counters per row)
CMS_TOPK = 15  # probe the top-K true-frequency tokens
AMS_K = 16  # independent sign estimators


def _token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    tok = d.select(F.explode(tokens(F.col("text"))).alias("token"))
    return tok.groupBy("token").agg(F.count("*").cast("long").alias("cnt"))


def _cms_bucket(tok_col, j_col):
    return F.pmod(
        hex32(F.concat(F.lit("cms"), j_col.cast("string"), F.lit("|"), tok_col)),
        F.lit(CMS_W),
    )


def q_cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point queries for the top-K tokens: exact count vs
    sketch estimate (see module docstring)."""
    cnt = _token_counts(spark, sf_dir)
    js = F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("j")
    grid = cnt.select("token", "cnt", js).select(
        "j", _cms_bucket(F.col("token"), F.col("j")).alias("b"), "cnt"
    )
    sketch = grid.groupBy("j", "b").agg(F.sum("cnt").cast("long").alias("c"))
    topk = cnt.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(CMS_TOPK)
    probes = topk.select("token", "cnt", js).withColumn(
        "b", _cms_bucket(F.col("token"), F.col("j"))
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "b"])
        .groupBy("token")
        .agg(
            F.max("cnt").cast("long").alias("true_cnt"),
            F.min("c").cast("long").alias("est_cnt"),
        )
    )


_TOKS = DUCK_TOKENS.format(x="text")
_CMS_H = DUCK_HEX32.format(x="'cms' || CAST({j} AS VARCHAR) || '|' || {t}")

_CMS_SQL = f"""
    WITH tok AS (
        SELECT unnest({_TOKS}) AS token FROM documents
    ),
    cnt AS (SELECT token, COUNT(*)::BIGINT AS cnt FROM tok GROUP BY token),
    js AS (SELECT unnest(generate_series(0, {CMS_D - 1})) AS j),
    sk AS (
        SELECT js.j,
               {_CMS_H.format(j="js.j", t="cnt.token")} % {CMS_W} AS b,
               SUM(cnt.cnt)::BIGINT AS c
        FROM cnt, js GROUP BY 1, 2
    ),
    topk AS (
        SELECT token, cnt FROM cnt ORDER BY cnt DESC, token ASC LIMIT {CMS_TOPK}
    ),
    probe AS (
        SELECT t.token, t.cnt, js.j,
               {_CMS_H.format(j="js.j", t="t.token")} % {CMS_W} AS b
        FROM topk t, js
    )
    SELECT p.token, MAX(p.cnt)::BIGINT AS true_cnt, MIN(sk.c)::BIGINT AS est_cnt
    FROM probe p JOIN sk ON sk.j = p.j AND sk.b = p.b
    GROUP BY p.token
"""


def q_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-moment (self-join size) estimate vs the exact F2
    (see module docstring). Single audit row."""
    cnt = _token_counts(spark, sf_dir)
    truth = cnt.agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("true_f2")
    )
    signs = cnt.select(
        "token", "cnt",
        F.explode(F.sequence(F.lit(0), F.lit(AMS_K - 1))).alias("j"),
    ).withColumn(
        "sgn",
        (
            F.pmod(
                hex32(
                    F.concat(
                        F.lit("ams"), F.col("j").cast("string"), F.lit("|"),
                        F.col("token"),
                    )
                ),
                F.lit(2),
            )
            * 2
            - 1
        ).cast("long"),
    )
    sums = signs.groupBy("j").agg(
        F.sum(F.col("sgn") * F.col("cnt")).cast("long").alias("s")
    )
    est = sums.agg(F.sum(F.col("s") * F.col("s")).cast("long").alias("est_sum"))
    return truth.crossJoin(F.broadcast(est)).select(
        F.lit(AMS_K).cast("long").alias("k"),
        "true_f2",
        "est_sum",
        (F.col("est_sum") / F.lit(float(AMS_K))).alias("est"),
    )


_AMS_H = DUCK_HEX32.format(x="'ams' || CAST(j AS VARCHAR) || '|' || token")

_AMS_SQL = f"""
    WITH tok AS (
        SELECT unnest({_TOKS}) AS token FROM documents
    ),
    cnt AS (SELECT token, COUNT(*)::BIGINT AS cnt FROM tok GROUP BY token),
    truth AS (SELECT SUM(cnt * cnt)::BIGINT AS true_f2 FROM cnt),
    js AS (SELECT unnest(generate_series(0, {AMS_K - 1})) AS j),
    signs AS (
        SELECT js.j,
               ({_AMS_H} % 2) * 2 - 1 AS sgn,
               cnt.cnt
        FROM cnt, js
    ),
    sums AS (SELECT j, SUM(sgn * cnt)::BIGINT AS s FROM signs GROUP BY j),
    est AS (SELECT SUM(s * s)::BIGINT AS est_sum FROM sums)
    SELECT CAST({AMS_K} AS BIGINT) AS k, truth.true_f2, est.est_sum,
           est.est_sum / {float(AMS_K)} AS est
    FROM truth, est
"""


QUERIES = {
    "cms_freq": q_cms_freq,
    "ams_f2": q_ams_f2,
}

ORACLES = {
    "cms_freq": _CMS_SQL,
    "ams_f2": _AMS_SQL,
}
