"""Language-model smoothing, batch 108a: interpolated Kneser–Ney
bigram probabilities in EXACT integer rationals — the smoothing layer
between ``lm_bigram`` (raw MLE conditionals) and ``good_turing`` (the
count-mass view): the estimator production n-gram LMs (KenLM) actually
ship, here with the discount d = 3/4 chosen so everything clears
denominators exactly.

P_KN(w|v) = max(c(vw) − d, 0)/c(v) + d·T(v)/c(v) · C(w)/B
with d = 3/4, T(v) = distinct continuations of v, C(w) = distinct
left-contexts of w (the continuation count — KN's insight: "Francisco"
is frequent but follows only "San"), B = distinct bigram types.
Multiplying through by 4·c(v)·B gives the exact integer pair
  p_num = max(4·c(vw) − 3, 0)·B + 3·T(v)·C(w),   p_den = 4·c(v)·B —
and Σ_w over the FULL vocabulary is exactly 1 per context
(test-pinned with Fraction arithmetic).

Scale design (100 TB): the bigram/continuation tables are
vocabulary²-bounded — three keyed aggregates over the map-side bigram
explode (c(vw); T(v)+c(v) by context; C(w) by word) + one 1-row B
total (allowlisted cross tier), then broadcast joins of
vocabulary-sized tables. Nothing corpus-sized crosses a shuffle after
the explode.

Reference parity: no LM layer in the reference; completes the n-gram
family (lm_commonness, lm_bigram, good_turing, decontam).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import duck_ngrams, ngrams, table

DISCOUNT_NUM, DISCOUNT_DEN = 3, 4  # d = 3/4


def q_kn_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-rational interpolated KN probability per observed bigram
    (module doc). Emits (v, w, c2, c1, t_v, c_w, p_num, p_den, p)."""
    d = table(spark, sf_dir, "documents", spread=True)
    bg = d.select(F.explode(ngrams(F.col("text"), 2)).alias("bg")).select(
        F.split("bg", " ")[0].alias("v"),
        F.split("bg", " ")[1].alias("w"),
    )
    c2 = bg.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c2"))
    ctx = c2.groupBy("v").agg(
        F.sum("c2").alias("c1"), F.count(F.lit(1)).alias("t_v")
    )
    cont = c2.groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    tot = c2.agg(F.count(F.lit(1)).alias("b"))
    j = (
        c2.join(F.broadcast(ctx), "v")
        .join(F.broadcast(cont), "w")
        .crossJoin(F.broadcast(tot))
    )
    p_num = (
        F.greatest(
            DISCOUNT_DEN * F.col("c2") - DISCOUNT_NUM, F.lit(0)
        )
        * F.col("b")
        + DISCOUNT_NUM * F.col("t_v") * F.col("c_w")
    )
    p_den = DISCOUNT_DEN * F.col("c1") * F.col("b")
    return j.select(
        "v",
        "w",
        F.col("c2").cast("long").alias("c2"),
        F.col("c1").cast("long").alias("c1"),
        F.col("t_v").cast("long").alias("t_v"),
        F.col("c_w").cast("long").alias("c_w"),
        p_num.cast("long").alias("p_num"),
        p_den.cast("long").alias("p_den"),
        (p_num.cast("double") / p_den.cast("double")).alias("p"),
    ).orderBy("v", "w")


_KN_SQL = f"""
WITH bg AS (
    SELECT g[1] AS v, g[2] AS w FROM (
        SELECT string_split(unnest({duck_ngrams(2)}), ' ') AS g
        FROM (
            SELECT list_filter(string_split_regex(text, '\\s+'),
                               t -> t <> '') AS toks
            FROM documents
        )
    )
),
c2 AS (SELECT v, w, count(*)::BIGINT AS c2 FROM bg GROUP BY v, w),
ctx AS (SELECT v, sum(c2)::BIGINT AS c1, count(*)::BIGINT AS t_v
        FROM c2 GROUP BY v),
cont AS (SELECT w, count(*)::BIGINT AS c_w FROM c2 GROUP BY w),
tot AS (SELECT count(*)::BIGINT AS b FROM c2)
SELECT c2.v, c2.w, c2.c2, ctx.c1, ctx.t_v, cont.c_w,
       (greatest({DISCOUNT_DEN} * c2.c2 - {DISCOUNT_NUM}, 0) * tot.b
        + {DISCOUNT_NUM} * ctx.t_v * cont.c_w)::BIGINT AS p_num,
       ({DISCOUNT_DEN} * ctx.c1 * tot.b)::BIGINT AS p_den,
       CAST(greatest({DISCOUNT_DEN} * c2.c2 - {DISCOUNT_NUM}, 0) * tot.b
            + {DISCOUNT_NUM} * ctx.t_v * cont.c_w AS DOUBLE)
           / CAST({DISCOUNT_DEN} * ctx.c1 * tot.b AS DOUBLE) AS p
FROM c2 JOIN ctx USING (v) JOIN cont USING (w) CROSS JOIN tot
ORDER BY v, w
"""


QUERIES = {"kn_bigram": q_kn_bigram}
ORACLES = {"kn_bigram": _KN_SQL}
