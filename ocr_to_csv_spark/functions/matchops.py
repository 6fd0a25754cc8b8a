"""Matching + agreement surface, batch 57: one deferred-acceptance
matching round (the Gale–Shapley/auction primitive for assignment at
scale) and Cohen's kappa between two of the repo's own quality
classifiers (inter-rater reliability — the metric that says whether
two curation filters agree beyond chance).

Scale design (100 TB):
- ``stable_match_round``: candidate generation is the grid-bucketed
  radius join (``geoops`` — equi-join, never all-pairs); a round is
  then two keyed min_by aggregations — every customer proposes to its
  nearest in-radius supplier, every supplier accepts its nearest
  proposer. Deterministic tie-breaks on (dist2, key). Full stable
  matching iterates this round on the rejected side; one round is the
  building block and is itself useful (greedy assignment).
- ``cohens_kappa``: composes two EXISTING oracle-checked classifiers
  (quality_score's band, gopher_quality's rule card) — one doc-keyed
  join, one aggregate to the 2×2 contingency, kappa emitted as the
  exact rational (N·Σdiag − Σrᵢcᵢ) / (N² − Σrᵢcᵢ); no float crosses
  engines.

Reference parity: no matching/agreement layer in the reference;
extends ``geoops`` (candidates) and audits the curation layer against
itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .curation8 import ORACLES as C8_ORACLES
from .geoops import _GEO_SQL, q_geo_grid_join
from .textops import ORACLES as TX_ORACLES


def q_stable_match_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One propose-accept matching round over in-radius
    (supplier, customer) candidates: customers propose to their
    nearest supplier, suppliers accept their nearest proposer."""
    cand = q_geo_grid_join(spark, sf_dir)
    prop = cand.groupBy("c_custkey").agg(
        F.min_by(
            "s_suppkey",
            F.struct(F.col("dist2").alias("d"),
                     F.col("s_suppkey").alias("k")),
        ).alias("s_suppkey"),
        F.min(F.struct(F.col("dist2").alias("d"),
                       F.col("s_suppkey").alias("k"))).alias("pd"),
    ).select("c_custkey", "s_suppkey", F.col("pd.d").alias("dist2"))
    return prop.groupBy("s_suppkey").agg(
        F.min_by(
            "c_custkey",
            F.struct(F.col("dist2").alias("d"),
                     F.col("c_custkey").alias("k")),
        ).alias("c_custkey"),
        F.min(F.struct(F.col("dist2").alias("d"),
                       F.col("c_custkey").alias("k"))).alias("ad"),
    ).select("s_suppkey", "c_custkey", F.col("ad.d").alias("dist2"))


# DuckDB's min_by has no struct ordering — encode the (dist2, key)
# lexicographic tie-break as one scalar (keys < 10^7 in every sf)
_MATCH_SQL = f"""
WITH cand AS ({_GEO_SQL}),
prop AS (
    SELECT c_custkey,
           min_by(s_suppkey, dist2 * 10000000 + s_suppkey) AS s_suppkey,
           min(dist2) AS dist2
    FROM cand GROUP BY c_custkey
)
SELECT s_suppkey,
       min_by(c_custkey, dist2 * 10000000 + c_custkey) AS c_custkey,
       min(dist2)::BIGINT AS dist2
FROM prop GROUP BY s_suppkey
"""


def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between rater A = (quality_score band == 'keep')
    and rater B = gopher_quality's keep flag, as an exact rational."""
    from .curation8 import q_gopher_quality
    from .textops import q_quality_score

    a = q_quality_score(spark, sf_dir).select(
        "doc_id", (F.col("band") == "keep").cast("int").alias("a")
    )
    b = q_gopher_quality(spark, sf_dir).select(
        "doc_id", F.col("keep").cast("int").alias("b")
    )
    j = a.join(b, "doc_id")
    agg = j.agg(
        F.sum(F.col("a") * F.col("b")).alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).alias("n00"),
    )
    n = F.col("n11") + F.col("n10") + F.col("n01") + F.col("n00")
    sum_rc = (
        (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")) * (F.col("n10") + F.col("n00"))
    )
    return agg.select(
        "n11", "n10", "n01", "n00",
        (n * (F.col("n11") + F.col("n00")) - sum_rc).alias("kappa_num"),
        (n * n - sum_rc).alias("kappa_den"),
    )


def _kappa_sql() -> str:
    return f"""
        WITH qa AS ({TX_ORACLES["quality_score"]}),
        qb AS ({C8_ORACLES["gopher_quality"]}),
        j AS (
            SELECT CASE WHEN qa.band = 'keep' THEN 1 ELSE 0 END AS a,
                   qb.keep AS b
            FROM qa JOIN qb USING (doc_id)
        ),
        c AS (
            SELECT sum(a * b) AS n11, sum(a * (1 - b)) AS n10,
                   sum((1 - a) * b) AS n01,
                   sum((1 - a) * (1 - b)) AS n00
            FROM j
        )
        SELECT n11::BIGINT AS n11, n10::BIGINT AS n10,
               n01::BIGINT AS n01, n00::BIGINT AS n00,
               ((n11 + n10 + n01 + n00) * (n11 + n00)
                - ((n11 + n10) * (n11 + n01)
                   + (n01 + n00) * (n10 + n00)))::BIGINT AS kappa_num,
               ((n11 + n10 + n01 + n00) * (n11 + n10 + n01 + n00)
                - ((n11 + n10) * (n11 + n01)
                   + (n01 + n00) * (n10 + n00)))::BIGINT AS kappa_den
        FROM c
    """


QUERIES = {
    "stable_match_round": q_stable_match_round,
    "cohens_kappa": q_cohens_kappa,
}

ORACLES = {
    "stable_match_round": _MATCH_SQL,
    "cohens_kappa": _kappa_sql(),
}
