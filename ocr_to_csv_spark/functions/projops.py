"""Projection + ranking-metric surface, batch 46: Johnson–Lindenstrauss
random projection (the cheap dimensionality reducer in front of every
large-scale ANN/cluster pass) and the exact Mann–Whitney AUC (the
ranking metric behind every quality-classifier threshold choice).

Scale design (100 TB):
- ``rp_embed`` multiplies each vector by a DATA-INDEPENDENT ±1 sign
  matrix (md5-derived constants, embedded as literals — the
  ``ring_assign`` convention): pure map-side zip_with/aggregate folds,
  zero shuffle, zero driver state. Achlioptas (2001): a ±1 matrix
  satisfies the JL lemma with the same distortion bounds as Gaussian.
  Projected values ship as round(y·10⁶) BIGINTs so the oracle compare
  is exact (both engines left-fold identical doubles in identical
  order — bit-equal before rounding).
- ``rp_pairs_ratio`` proves the JL distance-preservation contract on
  disjoint consecutive pairs: by linearity the projected distance is
  the projection OF THE DIFF vector, so it folds 16+1 expressions per
  pair, never materializing per-dimension rows. E[d²_proj] = 16·d²_full
  for the unscaled ±1 matrix; the unit test pins the empirical mean
  ratio inside [0.5, 1.5].
- ``auc_roc`` never ranks raw rows: scores bucket to exact cents and
  aggregate to a (cents → pos,neg counts) table FIRST (cardinality
  bounded by the score RANGE), then one prefix-sum window over that
  aggregate computes the tie-corrected Mann–Whitney U — returned as
  the exact integer 2U with n_pos/n_neg (AUC = u2/(2·n_pos·n_neg)),
  the ``ks_test`` shape.

Reference parity: no vector/eval layer in the reference
(rad10/OCR-to-CSV); complements similarity.py (ANN family) and
statsops2.py (KS drift test).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import table

IN_DIM = 64
RP_DIM = 16
RP_SCALE = 1_000_000


def _sign(j: int, k: int) -> float:
    """±1 from md5 parity of 'rp{j},{k}' — mirrored in the DuckDB
    oracle via ('0x'||substr(md5(...),1,8))::BIGINT % 2."""
    h = int(hashlib.md5(f"rp{j},{k}".encode()).hexdigest()[:8], 16)
    return 1.0 if h % 2 == 0 else -1.0


def _sign_rows() -> list[list[float]]:
    return [[_sign(j, k) for k in range(IN_DIM)] for j in range(RP_DIM)]


_DUCK_SIGN = (
    "(CASE WHEN (('0x' || substr(md5('rp' || {j} || ',' || ({k} - 1)), 1, 8))"
    "::BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END)"
)


def _sign_matrix():
    """The whole 16×64 matrix as ONE nested array literal — indexed
    inside a transform lambda, so the plan carries a single 1024-leaf
    constant instead of 16 unrolled fold expressions (which blew
    whole-stage codegen up to ~40 s of compile time)."""
    return F.array(*[
        F.array(*[F.lit(s) for s in row]) for row in _sign_rows()
    ])


def _proj_all(vec):
    """All RP_DIM projected components, in j order: transform over the
    literal sign matrix, each component a left fold of vec·signs."""
    m = _sign_matrix()
    return F.transform(
        F.sequence(F.lit(1), F.lit(RP_DIM)),
        lambda j: F.aggregate(
            F.zip_with(vec, F.element_at(m, j), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def _dvec(col):
    return F.transform(col, lambda x: x.cast("double"))


def q_rp_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64→16-dim ±1 random projection of every embedding, exploded to
    (vec_id, j, y_scaled) rows."""
    e = table(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", _dvec(F.col("embedding")).alias("v")
    )
    comps = F.transform(
        _proj_all(F.col("v")),
        lambda y: F.round(y * RP_SCALE).cast("long"),
    )
    return (
        e.select("vec_id", F.posexplode(comps).alias("j", "y_scaled"))
        .select("vec_id", F.col("j").cast("long").alias("j"), "y_scaled")
    )


_RP_FOLD = (
    "list_reduce(list_prepend(0.0::DOUBLE, list_transform("
    f"generate_series(1, {IN_DIM}), k -> {{v}}[k] * {_DUCK_SIGN.format(j='{j}', k='k')}"
    ")), (x, y) -> x + y)"
)

_RP_SQL = f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
proj AS (
    SELECT vec_id, j,
           {_RP_FOLD.format(v='v', j='j')} AS y
    FROM (SELECT vec_id, v, unnest(generate_series(0, {RP_DIM - 1})) AS j
          FROM e)
)
SELECT vec_id, j::BIGINT AS j,
       round(y * {RP_SCALE})::BIGINT AS y_scaled
FROM proj
"""


def q_rp_pairs_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL distance preservation on disjoint consecutive pairs: full
    64-dim squared distance vs 16-dim projected squared distance of the
    SAME pair (projection of the diff vector, by linearity). Scaled
    exact integers; E[d2_proj] = RP_DIM · d2_full."""
    e = table(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", _dvec(F.col("embedding")).alias("v")
    )
    a = e.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("a"), F.col("v").alias("av")
    )
    b = e.select((F.col("vec_id") - 1).alias("a"),
                 F.col("vec_id").alias("b"), F.col("v").alias("bv"))
    d = (
        a.join(b, "a")
        .withColumn("dv", F.zip_with("av", "bv", lambda x, y: x - y))
    )
    d2_full = F.aggregate(
        F.transform("dv", lambda x: x * x), F.lit(0.0),
        lambda acc, x: acc + x,
    )
    d2_proj = F.aggregate(
        F.transform(_proj_all(F.col("dv")), lambda p: p * p),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return d.select(
        "a", "b",
        F.round(d2_full * RP_SCALE).cast("long").alias("d2_full_s"),
        F.round(d2_proj * RP_SCALE).cast("long").alias("d2_proj_s"),
    )


_RP_PAIRS_SQL = f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
p AS (
    SELECT a.vec_id AS a, b.vec_id AS b,
           list_transform(generate_series(1, {IN_DIM}),
                          k -> a.v[k] - b.v[k]) AS dv
    FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
    WHERE a.vec_id % 2 = 0
),
d AS (
    SELECT a, b,
           list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(dv, x -> x * x)), (x, y) -> x + y) AS d2_full,
           list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(generate_series(0, {RP_DIM - 1}), j ->
                   {_RP_FOLD.format(v='dv', j='j')}
                   * {_RP_FOLD.format(v='dv', j='j')}
               )), (x, y) -> x + y) AS d2_proj
    FROM p
)
SELECT a, b,
       round(d2_full * {RP_SCALE})::BIGINT AS d2_full_s,
       round(d2_proj * {RP_SCALE})::BIGINT AS d2_proj_s
FROM d
"""


def q_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected Mann–Whitney AUC of event value as a
    predictor of event_type = 'purchase'. AUC = u2 / (2·n_pos·n_neg)."""
    ev = table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    agg = ev.groupBy("cents").agg(
        F.sum("pos").alias("np"),
        F.sum(1 - F.col("pos")).alias("nn"),
    )
    w_cum = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = agg.select(
        "np", "nn",
        (F.sum("nn").over(w_cum) - F.col("nn")).alias("neg_below"),
    )
    return cum.agg(
        F.sum(
            F.col("np") * (2 * F.col("neg_below") + F.col("nn"))
        ).alias("u2"),
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
    )


_AUC_SQL = """
WITH ev AS (
    SELECT round(value * 100)::BIGINT AS cents,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events
),
agg AS (
    SELECT cents, sum(pos) AS np, sum(1 - pos) AS nn
    FROM ev GROUP BY cents
),
cum AS (
    SELECT np, nn,
           sum(nn) OVER (ORDER BY cents) - nn AS neg_below
    FROM agg
)
SELECT sum(np * (2 * neg_below + nn))::BIGINT AS u2,
       sum(np)::BIGINT AS n_pos, sum(nn)::BIGINT AS n_neg
FROM cum
"""


QUERIES = {
    "rp_embed": q_rp_embed,
    "rp_pairs_ratio": q_rp_pairs_ratio,
    "auc_roc": q_auc_roc,
}

ORACLES = {
    "rp_embed": _RP_SQL,
    "rp_pairs_ratio": _RP_PAIRS_SQL,
    "auc_roc": _AUC_SQL,
}
