"""Classical-ML training primitives, batch 75: exact decision-stump
split search (the CART inner loop) and k-NN majority-vote
classification over the embedding table.

Scale design (100 TB):
- ``best_split``: the 1-D exact best-split search every tree learner
  iterates. Group by candidate threshold (the distinct feature
  values) → per-threshold (count, positives); one ordered window
  produces cumulative left-side counts, so each threshold's weighted
  Gini impurity needs NO self-join and NO re-scan:
      W(t) = A_l/n_l + A_r/n_r,  A = n² − pos² − neg²
  (A/n = n·gini). Every term is exact int64; the only floats are the
  two divisions + one add, rounded to 9dp in BOTH engines before the
  argmin (the wilson_rank/quality_score precedent — measured 1-ulp
  cross-engine drift discipline), tie-break on threshold asc. The
  window is a single sort over DISTINCT thresholds — at 100 TB you
  don't sort 10^12 raw rows: candidate thresholds come from the
  equi-depth histogram (``quantile_sketch``/``equidepth_hist``) and
  this same plan runs over the ≤1k candidates; the exact-over-distinct
  form here is the oracle-checkable ground truth of that approximation.
- ``knn_classify``: k-nearest-neighbor majority vote — each unlabeled
  query embedding takes the modal label of its TOP_K cosine neighbors,
  ties broken (votes desc, label asc). COMPOSES the oracle-anchored
  ``cosine_topk`` (similarity.py) for the neighbor lists — at scale
  the neighbor source swaps to ``ivf_search``/``pq_search`` (same
  (query_id, neighbor_id) shape, ANN-bucketed, never all-pairs); the
  brute-force baseline is what makes the vote itself strictly
  oracle-checkable. The vote is one groupBy + one min_by on a
  (−votes, label) struct — map-side partial agg over k-bounded rows.

Reference parity: no ML layer in the reference; extends the curation
stack (quality_classifier, calibration_bins, gains_table) with the two
training-loop primitives they feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .similarity import ORACLES as SIM_ORACLES
from .similarity import q_cosine_topk
from .util import table


def q_best_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decision-stump split on orders: feature = total price in
    cents, label = order is 1-URGENT. Returns the argmin-impurity
    threshold with its left/right class counts (module docstring)."""
    o = table(spark, sf_dir, "orders")
    rows = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderpriority") == "1-URGENT").cast("long").alias("pos"),
    )
    per_t = rows.groupBy("cents").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("pos").alias("p")
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per_t.select(
        "cents",
        F.sum("cnt").over(w).alias("n_l"),
        F.sum("p").over(w).alias("pos_l"),
        F.sum("cnt").over(wall).alias("n"),
        F.sum("p").over(wall).alias("pos"),
    )
    n_l, pos_l = F.col("n_l"), F.col("pos_l")
    n_r = F.col("n") - n_l
    pos_r = F.col("pos") - pos_l
    neg_l = n_l - pos_l
    neg_r = n_r - pos_r
    a_l = n_l * n_l - pos_l * pos_l - neg_l * neg_l
    a_r = n_r * n_r - pos_r * pos_r - neg_r * neg_r
    scored = cum.filter(n_r > 0).select(
        F.col("cents").alias("threshold"),
        n_l.alias("n_l"),
        pos_l.alias("pos_l"),
        n_r.alias("n_r"),
        pos_r.alias("pos_r"),
        F.round(
            a_l / n_l.cast("double") + a_r / n_r.cast("double"), 9
        ).alias("impurity"),
    )
    return scored.orderBy("impurity", "threshold").limit(1)


_BEST_SPLIT_SQL = """
WITH rows_ AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pos
    FROM orders
),
per_t AS (
    SELECT cents, count(*)::BIGINT AS cnt, sum(pos)::BIGINT AS p
    FROM rows_ GROUP BY cents
),
cum AS (
    SELECT cents,
           sum(cnt) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_l,
           sum(p) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pos_l,
           sum(cnt) OVER () AS n,
           sum(p) OVER () AS pos
    FROM per_t
),
scored AS (
    SELECT cents AS threshold, n_l, pos_l, n - n_l AS n_r,
           pos - pos_l AS pos_r,
           round(
               (n_l*n_l - pos_l*pos_l - (n_l-pos_l)*(n_l-pos_l))
                   / CAST(n_l AS DOUBLE)
               + ((n-n_l)*(n-n_l) - (pos-pos_l)*(pos-pos_l)
                  - ((n-n_l)-(pos-pos_l))*((n-n_l)-(pos-pos_l)))
                   / CAST(n - n_l AS DOUBLE),
               9) AS impurity
    FROM cum WHERE n - n_l > 0
)
SELECT threshold::BIGINT AS threshold, n_l::BIGINT AS n_l,
       pos_l::BIGINT AS pos_l, n_r::BIGINT AS n_r,
       pos_r::BIGINT AS pos_r, impurity
FROM scored ORDER BY impurity, threshold LIMIT 1
"""


def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority vote: each query (vec_id < N_QUERIES) takes the
    modal label of its TOP_K cosine neighbors; ties (votes desc,
    label asc). Neighbor lists from the oracle-anchored cosine_topk;
    at scale swap in ivf_search/pq_search (module docstring)."""
    nn = q_cosine_topk(spark, sf_dir)
    emb = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").cast("long").alias("label"),
    )
    votes = (
        nn.join(emb, "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    pick = F.struct((-F.col("votes")).alias("nv"), F.col("label").alias("l"))
    return (
        votes.groupBy("query_id")
        .agg(F.min(pick).alias("m"), F.max("votes").alias("top_votes"))
        .select(
            "query_id",
            F.col("m.l").alias("pred_label"),
            F.col("top_votes").alias("votes"),
        )
    )


def _knn_sql() -> str:
    # votes <= TOP_K (tiny), labels in [0, 9] — scalar tie-break encode
    return f"""
        WITH nn AS ({SIM_ORACLES["cosine_topk"]}),
        lbl AS (SELECT vec_id AS neighbor_id, label::BIGINT AS label
                FROM embeddings),
        votes AS (
            SELECT nn.query_id, lbl.label, count(*)::BIGINT AS votes
            FROM nn JOIN lbl USING (neighbor_id)
            GROUP BY nn.query_id, lbl.label
        )
        SELECT query_id::BIGINT AS query_id,
               min_by(label, (100 - votes) * 1000 + label)::BIGINT
                   AS pred_label,
               max(votes)::BIGINT AS votes
        FROM votes GROUP BY query_id
    """


QUERIES = {
    "best_split": q_best_split,
    "knn_classify": q_knn_classify,
}

ORACLES = {
    "best_split": _BEST_SPLIT_SQL,
    "knn_classify": _knn_sql(),
}
