"""Keyword + retrieval, batch 139: RAKE keyphrase extraction and
query-likelihood retrieval with Dirichlet smoothing — the unsupervised
keyphrase classic next to doc_tfidf_keywords/cooc_pmi, and the
language-model ranking that completes the retrieval family
(tfidf_topk, bm25_topk, rocchow/rrf).

Scale design (100 TB):
- ``rake_keywords`` (Rose et al. 2010): phrase segmentation is a pure
  map-side expression — stopwords are replaced by a '§' sentinel
  inside the token array, the re-join/split yields the candidate
  phrases with NO fold and no regex-adjacency pitfalls. Word stats
  (freq = occurrences in phrases, degree = Σ phrase length over
  occurrences) are ONE (word) keyed aggregate over the phrase-word
  explode; the RAKE score deg/freq is leaf-rounded to INTEGER nano
  per word (floor div — exact both engines) BEFORE the per-phrase
  sum, so phrase scores are pure int64. Output = corpus top-20
  phrases under a total order — bounded.
- ``ql_dirichlet``: the bm25_topk no-explode plan — per-doc tf
  columns for the fixed 3-term query map-side, ONE single-row corpus
  aggregate (collection length, collection frequencies) broadcast
  back, then the Dirichlet score ln((tf·|C| + µ·cf) / (|C|·(dl+µ)))
  per term: numerator/denominator exact int64, ONE IEEE div + ln
  leaf-rounded to nano per term, exact integer sum, and a top-10
  TakeOrderedAndProject. One scan + one tiny agg + one top-k.

Reference parity: no IR layer in the reference; extends
doc_tfidf_keywords (curation), bm25_topk (textops.py:1626), and the
phrase family (prefix_autocomplete, phrase_search).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textops import TFIDF_TERMS
from .util import DUCK_TOKENS, table, tokens

STOPWORDS = ("a", "the", "of", "and", "to", "in", "is", "for", "on", "with")
RAKE_MAX_WORDS = 4
RAKE_TOP = 20
QL_MU = 100
NANO = 1_000_000_000


def _phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, phrase) candidate phrases: stopword-delimited token
    runs of 1..RAKE_MAX_WORDS words (lowercased)."""
    d = table(spark, sf_dir, "documents", spread=True)
    toks = tokens(F.lower(F.col("text")))
    marked = F.transform(
        toks,
        lambda t: F.when(
            t.isin(*STOPWORDS), F.lit("§")
        ).otherwise(t),
    )
    phrases = F.filter(
        F.transform(
            F.split(F.array_join(marked, " "), "§"),
            lambda p: F.trim(p),
        ),
        lambda p: p != "",
    )
    return (
        d.select("doc_id", F.explode(phrases).alias("phrase"))
        .filter(F.size(F.split(F.col("phrase"), " ")) <= RAKE_MAX_WORDS)
    )


def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-RAKE_TOP phrases by RAKE score (module doc):
    (phrase, n_words, n_occur, score_nano)."""
    ph = _phrases(spark, sf_dir)
    words = ph.select(
        "phrase",
        F.split(F.col("phrase"), " ").alias("ws"),
    ).select(
        "phrase",
        F.size("ws").cast("long").alias("plen"),
        F.explode("ws").alias("word"),
    )
    wstats = words.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("plen").cast("long").alias("deg"),
    )
    wscore = wstats.select(
        "word", F.expr(f"(deg * {NANO}L) div freq").alias("wnano")
    )
    pscore = (
        words.join(wscore, "word")
        .groupBy("phrase")
        .agg(
            F.sum("wnano").cast("long").alias("score_tot"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    per_occ = ph.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occur")
    )
    # score_tot sums over every occurrence of the phrase; one
    # occurrence's score = score_tot / n_occur (exact: every
    # occurrence contributes the identical word-score sum)
    return (
        pscore.join(per_occ, "phrase")
        .select(
            "phrase",
            F.size(F.split(F.col("phrase"), " ")).cast("long").alias(
                "n_words"
            ),
            "n_occur",
            F.expr("score_tot div n_occur").cast("long").alias("score_nano"),
        )
        .orderBy(F.col("score_nano").desc(), "phrase")
        .limit(RAKE_TOP)
    )


def q_ql_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet query-likelihood top-10 for the fixed query (module
    doc): (doc_id, ql_nano)."""
    d = table(spark, sf_dir, "documents", spread=True)
    toks = tokens(F.col("text"))

    def tf(term):
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    base = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[tf(t).cast("long").alias(f"tf_{t}") for t in TFIDF_TERMS],
    )
    stats = base.agg(
        F.sum("dl").alias("clen"),
        *[F.sum(f"tf_{t}").alias(f"cf_{t}") for t in TFIDF_TERMS],
    )
    j = base.crossJoin(F.broadcast(stats))
    score = None
    for t in TFIDF_TERMS:
        num = (
            F.col(f"tf_{t}") * F.col("clen")
            + F.lit(QL_MU) * F.col(f"cf_{t}")
        ).cast("double")
        den = (F.col("clen") * (F.col("dl") + F.lit(QL_MU))).cast("double")
        part = F.round(F.ln(num / den) * NANO).cast("long")
        score = part if score is None else score + part
    return (
        j.select("doc_id", score.alias("ql_nano"))
        .orderBy(F.col("ql_nano").desc(), "doc_id")
        .limit(10)
    )


_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)
_TOKS = DUCK_TOKENS.format(x="lower(text)")

_PHRASE_CTE = f"""
ph AS (
    SELECT doc_id, phrase FROM (
        SELECT doc_id,
               unnest(list_filter(
                   list_transform(
                       string_split(array_to_string(
                           list_transform({_TOKS},
                               t -> CASE WHEN t IN ({_STOP_SQL})
                                         THEN '§' ELSE t END), ' '), '§'),
                       p -> trim(p)),
                   p -> p <> '')) AS phrase
        FROM documents
    )
    WHERE len(string_split(phrase, ' ')) <= {RAKE_MAX_WORDS}
)"""

_RAKE_SQL = f"""
WITH {_PHRASE_CTE},
words AS (
    SELECT phrase, len(string_split(phrase, ' '))::BIGINT AS plen,
           unnest(string_split(phrase, ' ')) AS word
    FROM ph
),
wstats AS (
    SELECT word, count(*)::BIGINT AS freq, sum(plen)::BIGINT AS deg
    FROM words GROUP BY word
),
wscore AS (SELECT word, (deg * {NANO}) // freq AS wnano FROM wstats),
pscore AS (
    SELECT w.phrase, sum(s.wnano)::BIGINT AS score_tot
    FROM words w JOIN wscore s USING (word)
    GROUP BY w.phrase
),
per_occ AS (SELECT phrase, count(*)::BIGINT AS n_occur FROM ph GROUP BY phrase)
SELECT p.phrase,
       len(string_split(p.phrase, ' '))::BIGINT AS n_words,
       o.n_occur,
       (p.score_tot // o.n_occur)::BIGINT AS score_nano
FROM pscore p JOIN per_occ o USING (phrase)
ORDER BY score_nano DESC, phrase
LIMIT {RAKE_TOP}
"""


def _ql_sql() -> str:
    toks = DUCK_TOKENS.format(x="text")
    tfs = ", ".join(
        f"len(list_filter({toks}, x -> x = '{t}'))::BIGINT AS tf_{t}"
        for t in TFIDF_TERMS
    )
    cfs = ", ".join(f"sum(tf_{t})::BIGINT AS cf_{t}" for t in TFIDF_TERMS)
    parts = " + ".join(
        f"CAST(round(ln((tf_{t} * clen + {QL_MU} * cf_{t})::DOUBLE / "
        f"(clen * (dl + {QL_MU}))::DOUBLE) * {NANO}) AS BIGINT)"
        for t in TFIDF_TERMS
    )
    return f"""
WITH base AS (
    SELECT doc_id, len({toks})::BIGINT AS dl, {tfs} FROM documents
),
stats AS (SELECT sum(dl)::BIGINT AS clen, {cfs} FROM base)
SELECT doc_id, ({parts})::BIGINT AS ql_nano
FROM base, stats
ORDER BY ql_nano DESC, doc_id
LIMIT 10
"""


QUERIES = {
    "rake_keywords": q_rake_keywords,
    "ql_dirichlet": q_ql_dirichlet,
}

ORACLES = {
    "rake_keywords": _RAKE_SQL,
    "ql_dirichlet": _ql_sql(),
}
