"""Training-data QA, batch 119: confident-learning label-noise
estimation over the embedding table, and held-out bigram perplexity of
the corpus LM — the two numbers a dataset curator checks before
training on a new batch (are the labels trustworthy; does the text
distribution drift from the LM the filters were tuned on).

Scale design (100 TB):
- ``label_noise_est``: class centroids are ONE keyed aggregate over
  integer-scaled coordinates (round(e·1000), the pca_cov discipline —
  exact int64 partials), rounded to integer centroids by a single
  IEEE divide+round per cell (bit-identical in both engines). The
  label-count fan-out (≤10 centroid rows broadcast against the scan)
  is map-side; the predicted label is a (vec, given) keyed min-struct
  over EXACT integer squared distances; the confident-learning joint
  matrix (given × predicted counts, off-diagonal = estimated noise)
  and per-class noise rates are label²-bounded metadata.
- ``heldout_ppl``: docs with doc_id % 10 == 0 are held out; the
  add-1-smoothed bigram LM (P = (c2+1)/(c1+V)) trains on the rest —
  two vocabulary-bounded count aggs + broadcast joins (the lm_bigram
  plan). Each held-out bigram's ln P is leaf-rounded to INTEGER
  nano-nats BEFORE summation, so the corpus-scale aggregation is
  exact int64 and order-independent; perplexity is one exp over the
  exact ratio, milli-rounded. Unseen words ride the same smoothing
  formula (c=0), so no special-casing crosses engines.

Reference parity: no ML-QA layer in the reference; builder-brief
extensions of the quality family (quality_classifier, dsir_weights,
psi_drift) and the LM family (lm_bigram, kn_bigram, lm_commonness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import DUCK_TOKENS, ngrams, table

LN_D = 8  # leading embedding dims
LN_SCALE = 1000  # integer coordinate scale
PPL_HOLD = 10  # doc_id % PPL_HOLD == 0 → held out


def _vi_sql(i: int) -> str:
    return f"CAST(round(embedding[{i + 1}]::DOUBLE * {LN_SCALE}) AS BIGINT)"



def predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, given, pred): nearest-integer-centroid predictions over
    the embedding table (module doc) — shared with fairness_audit."""
    emb = table(spark, sf_dir, "embeddings", spread=True)
    v = lambda i: F.round(  # noqa: E731
        F.element_at("embedding", i + 1) * LN_SCALE
    ).cast("long")
    vecs = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("label").cast("long").alias("given"),
        *[v(i).alias(f"v_{i}") for i in range(LN_D)],
    )
    cen = vecs.groupBy(F.col("given").alias("clabel")).agg(
        F.count(F.lit(1)).alias("nc"),
        *[F.sum(f"v_{i}").alias(f"s_{i}") for i in range(LN_D)],
    )
    cen = cen.select(
        "clabel",
        *[
            F.round(F.col(f"s_{i}").cast("double") / F.col("nc"))
            .cast("long")
            .alias(f"c_{i}")
            for i in range(LN_D)
        ],
    )
    dist = None
    for i in range(LN_D):
        t = (F.col(f"v_{i}") - F.col(f"c_{i}")) * (
            F.col(f"v_{i}") - F.col(f"c_{i}")
        )
        dist = t if dist is None else dist + t
    return (
        vecs.crossJoin(F.broadcast(cen))
        .select("vec_id", "given", F.struct(dist.alias("d"), F.col("clabel")).alias("dc"))
        .groupBy("vec_id", "given")
        .agg(F.min("dc").alias("m"))
        .select("vec_id", "given", F.col("m.clabel").alias("pred"))
    )


# DuckDB mirror of :func:`predictions` (shared by fairness_audit)
PRED_SQL = f"""
    SELECT vec_id, given, m.clabel AS pred FROM (
        SELECT vec_id, given,
               min(struct_pack(d := {' + '.join(
                   f'(v_{i} - c_{i}) * (v_{i} - c_{i})'
                   for i in range(LN_D))},
                   clabel := clabel)) AS m
        FROM (
            SELECT vec_id::BIGINT AS vec_id, label::BIGINT AS given,
                   {', '.join(f'{_vi_sql(i)} AS v_{i}' for i in range(LN_D))}
            FROM embeddings
        ) vecs CROSS JOIN (
            SELECT given AS clabel,
                   {', '.join(
                       f'CAST(round(CAST(sum(v_{i}) AS DOUBLE) / count(*))'
                       f' AS BIGINT) AS c_{i}'
                       for i in range(LN_D))}
            FROM (
                SELECT label::BIGINT AS given,
                       {', '.join(f'{_vi_sql(i)} AS v_{i}'
                                  for i in range(LN_D))}
                FROM embeddings
            ) GROUP BY given
        ) cen
        GROUP BY vec_id, given
    )
"""


def q_label_noise_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confident-learning joint counts + per-class noise rates
    (module doc): (given_label, pred_label, cnt, given_total,
    noise_milli)."""
    pred = predictions(spark, sf_dir)
    joint = pred.groupBy("given", "pred").agg(F.count(F.lit(1)).alias("cnt"))
    totals = joint.groupBy("given").agg(
        F.sum("cnt").alias("given_total"),
        F.sum(F.when(F.col("given") != F.col("pred"), F.col("cnt")).otherwise(0)).alias(
            "off"
        ),
    )
    return (
        joint.join(F.broadcast(totals), "given")
        .select(
            F.col("given").alias("given_label"),
            F.col("pred").alias("pred_label"),
            F.col("cnt").cast("long").alias("cnt"),
            F.col("given_total").cast("long").alias("given_total"),
            F.floor(F.col("off") * 1000 / F.col("given_total"))
            .cast("long")
            .alias("noise_milli"),
        )
        .orderBy("given_label", "pred_label")
    )


_LN_SQL = f"""
WITH vecs AS (
    SELECT vec_id::BIGINT AS vec_id, label::BIGINT AS given,
           {', '.join(f'{_vi_sql(i)} AS v_{i}' for i in range(LN_D))}
    FROM embeddings
),
cen AS (
    SELECT given AS clabel,
           {', '.join(
               f'CAST(round(CAST(sum(v_{i}) AS DOUBLE) / count(*)) AS BIGINT)'
               f' AS c_{i}'
               for i in range(LN_D))}
    FROM vecs GROUP BY given
),
pred AS (
    SELECT vec_id, given,
           min(struct_pack(d := {' + '.join(
               f'(v_{i} - c_{i}) * (v_{i} - c_{i})' for i in range(LN_D))},
               clabel := clabel)) AS m
    FROM vecs CROSS JOIN cen
    GROUP BY vec_id, given
),
joint AS (
    SELECT given, m.clabel AS pred, count(*)::BIGINT AS cnt
    FROM pred GROUP BY given, m.clabel
),
totals AS (
    SELECT given, sum(cnt)::BIGINT AS given_total,
           sum(CASE WHEN given <> pred THEN cnt ELSE 0 END)::BIGINT AS off
    FROM joint GROUP BY given
)
SELECT j.given::BIGINT AS given_label, j.pred::BIGINT AS pred_label,
       j.cnt, t.given_total,
       CAST(floor(t.off * 1000.0 / t.given_total) AS BIGINT) AS noise_milli
FROM joint j JOIN totals t USING (given)
ORDER BY given_label, pred_label
"""


def q_heldout_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out add-1 bigram perplexity in exact nano-nats
    (module doc): one row (n_docs, n_bigrams, sum_lognano, ppl_milli)."""
    d = table(spark, sf_dir, "documents", spread=True).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    train = d.filter(F.col("doc_id") % PPL_HOLD != 0)
    held = d.filter(F.col("doc_id") % PPL_HOLD == 0)
    tb = train.select(F.explode(ngrams(F.col("text"), 2)).alias("bg"))
    c2 = tb.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    c1 = (
        c2.withColumn("w1", F.split("bg", " ")[0])
        .groupBy("w1")
        .agg(F.sum("c2").alias("c1"))
    )
    vocab = train.select(
        F.explode(F.split("text", r"\s+")).alias("t")
    ).filter(F.col("t") != "").agg(F.count_distinct("t").alias("v"))
    hb = held.select(
        "doc_id", F.explode(ngrams(F.col("text"), 2)).alias("bg")
    ).withColumn("w1", F.split("bg", " ")[0])
    scored = (
        hb.join(F.broadcast(c2), "bg", "left")
        .join(F.broadcast(c1), "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.coalesce("c2", F.lit(0)) + 1).cast("double")
                    / (F.coalesce("c1", F.lit(0)) + F.col("v"))
                )
                * 1e9
            )
            .cast("long")
            .alias("lognano"),
        )
    )
    agg = scored.agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("lognano").alias("sum_lognano"),
    )
    return agg.select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.col("sum_lognano").cast("long").alias("sum_lognano"),
        F.round(
            F.exp(
                -F.col("sum_lognano").cast("double")
                / 1e9
                / F.col("n_bigrams")
            )
            * 1000
        )
        .cast("long")
        .alias("ppl_milli"),
    )


_TOKS = DUCK_TOKENS.format(x="text")
_BGS = (
    "list_transform(generate_series(1, greatest(len({t}) - 1, 0)), "
    "i -> {t}[i] || ' ' || {t}[i+1])"
)


_PPL_SQL = f"""
WITH docs AS (
    SELECT doc_id::BIGINT AS doc_id, {_TOKS} AS toks FROM documents
),
tb AS (
    SELECT unnest({_BGS.format(t='toks')}) AS bg
    FROM docs WHERE doc_id % {PPL_HOLD} <> 0
),
c2 AS (SELECT bg, count(*)::BIGINT AS c2 FROM tb GROUP BY bg),
c1 AS (
    SELECT string_split(bg, ' ')[1] AS w1, sum(c2)::BIGINT AS c1
    FROM c2 GROUP BY 1
),
vocab AS (
    SELECT count(DISTINCT t)::BIGINT AS v FROM (
        SELECT unnest(toks) AS t FROM docs WHERE doc_id % {PPL_HOLD} <> 0
    )
),
hb AS (
    SELECT doc_id, unnest({_BGS.format(t='toks')}) AS bg
    FROM docs WHERE doc_id % {PPL_HOLD} = 0
),
scored AS (
    SELECT h.doc_id,
           CAST(round(ln((coalesce(c2.c2, 0) + 1)::DOUBLE
                         / (coalesce(c1.c1, 0) + (SELECT v FROM vocab)))
                      * 1e9) AS BIGINT) AS lognano
    FROM hb h
    LEFT JOIN c2 ON c2.bg = h.bg
    LEFT JOIN c1 ON c1.w1 = string_split(h.bg, ' ')[1]
)
SELECT count(DISTINCT doc_id)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_bigrams,
       sum(lognano)::BIGINT AS sum_lognano,
       CAST(round(exp(-CAST(sum(lognano) AS DOUBLE) / 1e9 / count(*))
                  * 1000) AS BIGINT) AS ppl_milli
FROM scored
"""


QUERIES = {
    "label_noise_est": q_label_noise_est,
    "heldout_ppl": q_heldout_ppl,
}

ORACLES = {
    "label_noise_est": _LN_SQL,
    "heldout_ppl": _PPL_SQL,
}
