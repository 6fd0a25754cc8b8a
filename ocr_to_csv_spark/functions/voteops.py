"""Rank aggregation, batch 146: Borda count and the Condorcet
pairwise-majority audit over three of the engine's own document
rankers — the social-choice classics next to rrf_fusion/rbo_overlap
/kendall_tau, answering "which doc wins across rankers" and "is that
win majority-robust".

Scale design (100 TB):
- Three deterministic total orders over documents — quality-classifier
  score, token length, tf('table') — each ranked ONCE (row_number
  under (metric desc, doc_id); at production scale this is the
  distinct-value rank-assignment discipline, here the ranker table is
  already corpus-keyed). Everything downstream operates on top-K
  slices: bounded.
- ``borda_count``: points = K − rank for each ranker's top-K=20, one
  unionByName + ONE keyed sum — the fusion itself never touches the
  corpus again. Top-10 under a total order.
- ``condorcet_check``: among the Borda top-10, x beats y iff ≥2 of 3
  rankers place x above y — a 10×10 self-join on the bounded
  candidate set carrying the three rank positions; emits per
  candidate its pairwise win count and the is_condorcet flag
  (n_beats = 9 ⇔ beats everyone). Borda winner ≠ Condorcet winner is
  the classic divergence the test allows for and reports.

Reference parity: no voting layer in the reference; extends
rrf_fusion (irops.py), rbo_overlap, kendall_tau, team_draft.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .textops import QC_BIAS, QC_BUCKETS, _qc_weight
from .util import DUCK_HEX32, DUCK_TOKENS, hex32, table, tokens

VOTE_K = 20
VOTE_TOP = 10
COND_TOP = 10


def _ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, r_q, r_len, r_tf): positions under the three rankers."""
    d = table(spark, sf_dir, "documents", spread=True)
    toks = tokens(F.col("text"))
    score = F.aggregate(
        F.transform(toks, lambda t: _qc_weight(hex32(t) % QC_BUCKETS)),
        F.lit(QC_BIAS).cast("long"),
        lambda acc, x: acc + x,
    )
    base = d.select(
        "doc_id",
        score.alias("q"),
        F.size(toks).cast("long").alias("ln"),
        F.size(F.filter(toks, lambda x: x == "table")).cast("long").alias(
            "tf"
        ),
    )
    out = base
    for m, r in (("q", "r_q"), ("ln", "r_len"), ("tf", "r_tf")):
        w = Window.orderBy(F.col(m).desc(), "doc_id")
        out = out.withColumn(r, F.row_number().over(w).cast("long"))
    return out.select("doc_id", "r_q", "r_len", "r_tf")


def q_borda_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-VOTE_TOP docs by Borda points over the three rankers'
    top-K lists (module doc): (doc_id, borda, n_lists)."""
    r = _ranks(spark, sf_dir)
    parts = []
    for col in ("r_q", "r_len", "r_tf"):
        parts.append(
            r.filter(F.col(col) <= VOTE_K).select(
                "doc_id", (F.lit(VOTE_K) - F.col(col)).alias("pts")
            )
        )
    allp = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return (
        allp.groupBy("doc_id")
        .agg(
            F.sum("pts").cast("long").alias("borda"),
            F.count(F.lit(1)).cast("long").alias("n_lists"),
        )
        .orderBy(F.col("borda").desc(), "doc_id")
        .limit(VOTE_TOP)
    )


def q_condorcet_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-majority audit among the Borda top candidates (module
    doc): (doc_id, borda, n_beats, is_condorcet)."""
    r = _ranks(spark, sf_dir)
    cand = q_borda_count(spark, sf_dir).limit(COND_TOP).join(r, "doc_id")
    a = cand.select(*[F.col(c).alias(f"a_{c}") for c in cand.columns])
    b = cand.select(*[F.col(c).alias(f"b_{c}") for c in cand.columns])
    pairs = a.join(b, F.col("a_doc_id") != F.col("b_doc_id"))
    wins = (
        (F.col("a_r_q") < F.col("b_r_q")).cast("int")
        + (F.col("a_r_len") < F.col("b_r_len")).cast("int")
        + (F.col("a_r_tf") < F.col("b_r_tf")).cast("int")
    )
    beats = pairs.filter(wins >= 2).groupBy(
        F.col("a_doc_id").alias("doc_id")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_beats"))
    return (
        cand.select("doc_id", "borda")
        .join(beats, "doc_id", "left")
        .select(
            "doc_id",
            "borda",
            F.coalesce("n_beats", F.lit(0)).cast("long").alias("n_beats"),
            (F.coalesce("n_beats", F.lit(0)) == COND_TOP - 1)
            .cast("long")
            .alias("is_condorcet"),
        )
        .orderBy(F.col("n_beats").desc(), "doc_id")
    )


_QC_W_SQL = (
    f"(((({DUCK_HEX32.format(x='t')}) % {QC_BUCKETS}) * 2654435761) "
    f"% 1001 - 500)"
)
_TOKS = DUCK_TOKENS.format(x="text")

_RANKS_CTE = f"""
base AS (
    SELECT doc_id,
           ({QC_BIAS} + coalesce(
               list_sum(list_transform({_TOKS}, t -> {_QC_W_SQL})), 0
           ))::BIGINT AS q,
           len({_TOKS})::BIGINT AS ln,
           len(list_filter({_TOKS}, x -> x = 'table'))::BIGINT AS tf
    FROM documents
),
ranks AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY q DESC, doc_id)::BIGINT AS r_q,
           row_number() OVER (ORDER BY ln DESC, doc_id)::BIGINT AS r_len,
           row_number() OVER (ORDER BY tf DESC, doc_id)::BIGINT AS r_tf
    FROM base
)"""

_BORDA_CORE = f"""
allp AS (
    SELECT doc_id, {VOTE_K} - r_q AS pts FROM ranks WHERE r_q <= {VOTE_K}
    UNION ALL
    SELECT doc_id, {VOTE_K} - r_len FROM ranks WHERE r_len <= {VOTE_K}
    UNION ALL
    SELECT doc_id, {VOTE_K} - r_tf FROM ranks WHERE r_tf <= {VOTE_K}
),
borda AS (
    SELECT doc_id, sum(pts)::BIGINT AS borda, count(*)::BIGINT AS n_lists
    FROM allp GROUP BY doc_id
    ORDER BY borda DESC, doc_id
    LIMIT {VOTE_TOP}
)"""

_BORDA_SQL = f"""
WITH {_RANKS_CTE},
{_BORDA_CORE}
SELECT doc_id, borda, n_lists FROM borda ORDER BY borda DESC, doc_id
"""

_COND_SQL = f"""
WITH {_RANKS_CTE},
{_BORDA_CORE},
cand AS (
    SELECT b.doc_id, b.borda, r.r_q, r.r_len, r.r_tf
    FROM (SELECT * FROM borda LIMIT {COND_TOP}) b
    JOIN ranks r USING (doc_id)
),
beats AS (
    SELECT a.doc_id, count(*)::BIGINT AS n_beats
    FROM cand a JOIN cand b ON a.doc_id <> b.doc_id
    WHERE (CASE WHEN a.r_q < b.r_q THEN 1 ELSE 0 END
         + CASE WHEN a.r_len < b.r_len THEN 1 ELSE 0 END
         + CASE WHEN a.r_tf < b.r_tf THEN 1 ELSE 0 END) >= 2
    GROUP BY a.doc_id
)
SELECT c.doc_id, c.borda,
       coalesce(bt.n_beats, 0)::BIGINT AS n_beats,
       (coalesce(bt.n_beats, 0) = {COND_TOP - 1})::BIGINT AS is_condorcet
FROM cand c LEFT JOIN beats bt ON bt.doc_id = c.doc_id
ORDER BY n_beats DESC, c.doc_id
"""

QUERIES = {
    "borda_count": q_borda_count,
    "condorcet_check": q_condorcet_check,
}

ORACLES = {
    "borda_count": _BORDA_SQL,
    "condorcet_check": _COND_SQL,
}
