"""Composed pipeline audits, batch 12: Zipf-law fit, contrastive
hard-negative mining, and the split-leakage audit — operators built BY
COMPOSING the existing layers (vocabulary stats, IVF coarse quantizer,
LSH candidate pairs, leakage-safe splits), the way a production
curation pipeline chains its stages.

Scale design (100 TB):
- ``zipf_fit`` regresses ln(count) on ln(rank) over the top-100 corpus
  tokens: the token aggregate partial-aggregates map-side, the top-100
  is a TakeOrdered (never a global sort), and the regression folds run
  over ONE 100-element list — a one-row result whatever the corpus
  size. Natural text fits slope ≈ -1 (Zipf); a corpus drifting toward
  0 is template/boilerplate spam — a cheap corpus-health gate.
- ``hard_negatives`` mines contrastive negatives the IVF way: each
  query reranks ONLY its own coarse cell (cost O(N/cells) per query,
  same plan as ``ivf_search``), keeps the top-3 most-similar vectors
  with a DIFFERENT label — "close in embedding space, different class"
  is exactly the hard-negative definition. Cell assignment reuses
  ``similarity.q_ivf_assign`` verbatim.
- ``split_leakage_audit`` joins the LSH near-dup candidate pairs
  against the content-hash split assignment and counts pairs per
  (split_a, split_b): any off-diagonal count is evaluation
  contamination pressure. Pairs come from the banded equi-join (never
  all-pairs); the two split lookups are doc-keyed equi-joins.

Reference parity: no counterpart in the reference (builder-brief
training-data-pipeline extensions; composition over
``similarity.py`` / ``dedup.py`` / ``dataops.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import dataops, dedup, similarity
from .util import DUCK_TOKENS, table, tokens

ZIPF_TOP = 100  # vocabulary prefix the Zipf regression runs on
HN_Q_LO = similarity.N_CENTROIDS  # hard-negative queries: vec_id 5..14
HN_Q_HI = 15
HN_K = 3  # negatives kept per query


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares fit of ln(count) = intercept + slope*ln(rank) over
    the top-100 tokens. Sums are sequential folds over the rank-sorted
    list (Spark ``F.aggregate`` == DuckDB ``list_reduce``), so both
    engines accumulate identical doubles; slope/intercept rounded 4."""
    d = table(spark, sf_dir, "documents", spread=True)
    top = (
        d.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(ZIPF_TOP)
    )
    one = top.agg(
        F.sort_array(
            F.collect_list(
                F.struct((-F.col("cnt")).alias("nc"), F.col("tok").alias("t"))
            )
        ).alias("l")
    )
    n = F.size("l")

    def fold(term):
        return F.aggregate(
            F.sequence(F.lit(1), n),
            F.lit(0.0),
            lambda acc, i: acc + term(i),
        )

    def lx(i):
        return F.log(i.cast("double"))

    def ly(i):
        return F.log((-F.element_at(F.col("l"), i)["nc"]).cast("double"))

    one = one.select(
        n.cast("long").alias("n_terms"),
        fold(lx).alias("sx"),
        fold(ly).alias("sy"),
        fold(lambda i: lx(i) * lx(i)).alias("sxx"),
        fold(lambda i: lx(i) * ly(i)).alias("sxy"),
    )
    nn = F.col("n_terms").cast("double")
    slope = (nn * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nn * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return one.select(
        "n_terms",
        F.round(slope, 4).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / nn, 4).alias("intercept"),
    )


_ZIPF_SQL = f"""
    WITH t AS (
        SELECT doc_id, {DUCK_TOKENS.format(x='text')} AS toks FROM documents
    ),
    top AS (
        SELECT tok, count(*)::BIGINT AS cnt
        FROM (SELECT unnest(toks) AS tok FROM t)
        GROUP BY tok ORDER BY cnt DESC, tok ASC LIMIT {ZIPF_TOP}
    ),
    one AS (
        SELECT list(cnt ORDER BY cnt DESC, tok ASC) AS l,
               count(*)::BIGINT AS n_terms
        FROM top
    ),
    sums AS (
        SELECT n_terms,
               list_reduce(list_prepend(0.0::DOUBLE, generate_series(1, n_terms)),
                   (acc, i) -> acc + ln(i)) AS sx,
               list_reduce(list_prepend(0.0::DOUBLE, generate_series(1, n_terms)),
                   (acc, i) -> acc + ln(l[i::BIGINT]::DOUBLE)) AS sy,
               list_reduce(list_prepend(0.0::DOUBLE, generate_series(1, n_terms)),
                   (acc, i) -> acc + ln(i) * ln(i)) AS sxx,
               list_reduce(list_prepend(0.0::DOUBLE, generate_series(1, n_terms)),
                   (acc, i) -> acc + ln(i) * ln(l[i::BIGINT]::DOUBLE)) AS sxy
        FROM one
    )
    SELECT n_terms,
           round((n_terms::DOUBLE * sxy - sx * sy)
                 / (n_terms::DOUBLE * sxx - sx * sx), 4) AS slope,
           round((sy - ((n_terms::DOUBLE * sxy - sx * sy)
                        / (n_terms::DOUBLE * sxx - sx * sx)) * sx)
                 / n_terms::DOUBLE, 4) AS intercept
    FROM sums
"""


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard negatives: for each query vector (vec_id 5..14)
    rank only its own IVF cell's members (vec_id >= 15) that carry a
    DIFFERENT label; keep the top-3 by cosine. The candidate set shrinks
    O(cells)-fold exactly as in ``ivf_search`` — mining stays cheap at
    any corpus size because similarity never leaves the coarse cell."""
    e = similarity._emb(spark, sf_dir)
    assign = similarity.q_ivf_assign(spark, sf_dir).select("vec_id", "centroid")
    queries = (
        e.filter((F.col("vec_id") >= HN_Q_LO) & (F.col("vec_id") < HN_Q_HI))
        .join(assign, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel"),
            F.col("v").alias("qv"), F.col("nrm").alias("qn"),
            F.col("centroid").alias("qc"),
        )
    )
    cands = (
        e.filter(F.col("vec_id") >= HN_Q_HI)
        .join(assign, "vec_id")
        .select(
            F.col("vec_id").alias("neg_id"), F.col("label").alias("clabel"),
            F.col("v").alias("cv"), F.col("nrm").alias("cn"),
            F.col("centroid").alias("cc"),
        )
    )
    sims = (
        queries.join(cands, queries.qc == cands.cc)
        .filter(F.col("qlabel") != F.col("clabel"))
        .select(
            "query_id",
            "neg_id",
            F.col("qc").alias("cell"),
            F.round(
                similarity._fold_dot(F.col("qv"), F.col("cv"))
                / (F.col("qn") * F.col("cn")),
                4,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neg_id"))
    return (
        sims.withColumn("rn_", F.row_number().over(w))
        .filter(F.col("rn_") <= HN_K)
        .select("query_id", "neg_id", "cell", "sim")
    )


_HN_SQL = f"""
    WITH assign AS ({similarity.ORACLES['ivf_assign']}),
    e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v,
               sqrt(list_reduce(
                   list_prepend(0.0::DOUBLE,
                       list_transform(generate_series(1, {similarity.DIM}),
                                      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)),
                   (x, y) -> x + y)) AS nrm
        FROM embeddings
    ),
    q AS (
        SELECT e.vec_id AS query_id, e.label AS qlabel, e.v AS qv,
               e.nrm AS qn, a.centroid AS qc
        FROM e JOIN assign a ON a.vec_id = e.vec_id
        WHERE e.vec_id >= {HN_Q_LO} AND e.vec_id < {HN_Q_HI}
    ),
    c AS (
        SELECT e.vec_id AS neg_id, e.label AS clabel, e.v AS cv,
               e.nrm AS cn, a.centroid AS cc
        FROM e JOIN assign a ON a.vec_id = e.vec_id
        WHERE e.vec_id >= {HN_Q_HI}
    ),
    sims AS (
        SELECT q.query_id, c.neg_id, q.qc AS cell,
               round(list_reduce(
                   list_prepend(0.0::DOUBLE,
                       list_transform(generate_series(1, {similarity.DIM}),
                                      i -> q.qv[i] * c.cv[i])),
                   (x, y) -> x + y) / (q.qn * c.cn), 4) AS sim
        FROM q JOIN c ON c.cc = q.qc
        WHERE q.qlabel <> c.clabel
    )
    SELECT query_id, neg_id, cell, sim FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY sim DESC, neg_id ASC
        ) AS rn_ FROM sims
    ) WHERE rn_ <= {HN_K}
"""


def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation-contamination audit: count LSH near-dup candidate
    pairs per (split_a, split_b). Off-diagonal rows are near-duplicates
    straddling train/val/test — the leakage the content-hash split
    protects against for EXACT dups but near-dups can still cross."""
    pairs = dedup.q_lsh_pairs(spark, sf_dir)
    sp = dataops.q_split_assign(spark, sf_dir).select("doc_id", "split")
    return (
        pairs.join(sp.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("split", "split_a")
        .join(
            sp.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "split", "split_b"
            ),
            "doc_b",
        )
        .groupBy("split_a", "split_b")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum((F.col("split_a") != F.col("split_b")).cast("long")).alias(
                "n_leaky"
            ),
        )
    )


_LEAK_SQL = f"""
    WITH pairs AS ({dedup.ORACLES['lsh_pairs']}),
    sp AS (
        SELECT doc_id, split FROM ({dataops.ORACLES['split_assign']})
    )
    SELECT a.split AS split_a, b.split AS split_b,
           count(*)::BIGINT AS n_pairs,
           sum((a.split <> b.split)::BIGINT)::BIGINT AS n_leaky
    FROM pairs p
    JOIN sp a ON a.doc_id = p.doc_a
    JOIN sp b ON b.doc_id = p.doc_b
    GROUP BY a.split, b.split
"""




ER_ROUNDS = 4  # min-label propagation rounds over the linkage graph


def q_er_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution GOLDEN RECORDS — the composition the linkage
    score feeds: ``record_linkage``'s above-threshold pairs become an
    undirected graph, ER_ROUNDS of min-label propagation collapse each
    connected linkage cluster to its min doc_id (clusters are
    block-confined and tiny, so a fixed small round count converges —
    the same bounded-superstep idiom as ``dedup_clusters``), and one
    row per matched doc carries its cluster id plus an ``is_golden``
    flag on the cluster's canonical record (min doc_id — deterministic
    survivor pick). Per round: one keyed equi-join + one min-aggregate,
    linkage-table-sized, never corpus-sized."""
    from .analytics2 import q_record_linkage

    links = q_record_linkage(spark, sf_dir).select("doc_a", "doc_b")
    edges = links.unionByName(
        links.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).distinct()
    nodes = (
        edges.select(F.col("doc_a").alias("id"))
        .union(edges.select(F.col("doc_b").alias("id")))
        .distinct()
    )
    lab = nodes.select("id", F.col("id").alias("lab"))
    for _ in range(ER_ROUNDS):
        nb = (
            edges.join(
                lab.select(F.col("id").alias("doc_b"), F.col("lab").alias("nlab")),
                "doc_b",
            )
            .groupBy("doc_a")
            .agg(F.min("nlab").alias("m"))
        )
        lab = lab.join(nb, lab.id == nb.doc_a, "left").select(
            "id", F.least(F.col("lab"), F.coalesce("m", F.col("lab"))).alias("lab")
        )
    return lab.select(
        F.col("id").alias("doc_id"),
        F.col("lab").alias("cluster_id"),
        (F.col("id") == F.col("lab")).cast("int").alias("is_golden"),
    )


QUERIES = {
    "er_golden": q_er_golden,
    "zipf_fit": q_zipf_fit,
    "hard_negatives": q_hard_negatives,
    "split_leakage_audit": q_split_leakage_audit,
}

ORACLES = {
    "zipf_fit": _ZIPF_SQL,
    "hard_negatives": _HN_SQL,
    "split_leakage_audit": _LEAK_SQL,
}


def _er_golden_sql() -> str:
    from .analytics2 import ORACLES as A2_ORACLES

    from_links = A2_ORACLES["record_linkage"]
    parts = [
        f"WITH links AS MATERIALIZED ({from_links})",
        """edges AS MATERIALIZED (
            SELECT doc_a, doc_b FROM links
            UNION SELECT doc_b AS doc_a, doc_a AS doc_b FROM links
        )""",
        """nodes AS MATERIALIZED (
            SELECT DISTINCT doc_a AS id FROM edges
            UNION SELECT DISTINCT doc_b AS id FROM edges
        )""",
        "l0 AS MATERIALIZED (SELECT id, id AS lab FROM nodes)",
    ]
    from .composed import ER_ROUNDS
    for r in range(ER_ROUNDS):
        parts.append(f"""l{r+1} AS MATERIALIZED (
            SELECT l.id,
                   least(l.lab, coalesce(m.m, l.lab)) AS lab
            FROM l{r} l LEFT JOIN (
                SELECT e.doc_a AS nid, min(x.lab) AS m
                FROM edges e JOIN l{r} x ON x.id = e.doc_b
                GROUP BY e.doc_a
            ) m ON m.nid = l.id
        )""")
    body = ",\n".join(parts)
    return (body + f"\nSELECT id AS doc_id, lab AS cluster_id, "
            f"(id = lab)::INT AS is_golden FROM l{ER_ROUNDS}")


ORACLES["er_golden"] = _er_golden_sql()

