"""Corpus-curation operators, batch 43: the Gopher quality rule card
(explicit per-rule flags) and consistent-hash ring placement for
shard/storage assignment.

Scale design (100 TB):
- ``gopher_quality`` (Rae et al. 2021, the non-repetition rule card —
  the repetition rules are ``repetition``): word-count bounds,
  mean-word-length band, minimum stop-word evidence, and the
  alphabetic-word ratio, each emitted as its own 0/1 flag plus the
  conjunction ``keep``. Every rule is evaluated in INTEGER arithmetic
  (mean-length band ``lo·n ≤ chars ≤ hi·n`` instead of a float
  division; ratio ``alpha/n ≥ 0.8`` as ``5·alpha ≥ 4·n``) so the gate
  is bit-exact and the filter is a pure map-side expression — zero
  shuffles, full codegen, embarrassingly parallel at 10^12 docs.
  Complements ``quality_score`` (blended heuristic score) and
  ``quality_classifier`` (learned linear model): this is the
  auditable rule card, flag-per-rule, the shape a curation pipeline
  reports to its data card.
- ``ring_assign``: consistent hashing with virtual nodes (Karger et
  al. / Dynamo) — THE placement function for sharding 10^12 docs
  across storage or serving nodes so that adding/removing one node
  moves only ~1/N of the keys (vs rehash-everything for mod-N). The
  ring (N_NODES × N_VNODES md5 points) is data-independent, computed
  once at plan-build time and embedded as a 128-element literal —
  per-row assignment is a pure expression (first ring point ≥ key,
  wrap to the ring minimum), no join, no shuffle except the final
  8-group count. The emitted per-node counts are the balance audit:
  vnodes keep the max/min share near 1 even though raw md5 arcs are
  exponentially skewed.

Reference parity: the reference has no curation layer; these extend
the training-data surface like ``curation7.py``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import DUCK_HEX32, DUCK_TOKENS, hex32, table, tokens

# gopher rule constants (tuned so every flag varies on the sf corpora:
# token counts there span 10..99, mean word length 3.7..5.3)
GQ_WORDS_MIN = 25
GQ_WORDS_MAX = 90
GQ_MEANLEN_LO = 4  # mean word length band [4, 5] as integer cross-mult
GQ_MEANLEN_HI = 5
GQ_STOP_MIN = 2
GQ_STOPWORDS = ("the", "a", "of", "to", "in", "and", "is", "it")

N_NODES = 8
N_VNODES = 16


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-card flags per document (see module docstring)."""
    d = table(spark, sf_dir, "documents", spread=True)
    toks = tokens(F.col("text"))
    n_tok = F.size(toks).cast("long")
    chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    stop_cnt = F.size(F.filter(toks, lambda t: t.isin(*GQ_STOPWORDS))).cast(
        "long"
    )
    alpha_cnt = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("long")
    f_words = (
        (n_tok >= GQ_WORDS_MIN) & (n_tok <= GQ_WORDS_MAX)
    ).cast("long")
    f_meanlen = (
        (chars >= GQ_MEANLEN_LO * n_tok) & (chars <= GQ_MEANLEN_HI * n_tok)
    ).cast("long")
    f_stop = (stop_cnt >= GQ_STOP_MIN).cast("long")
    f_alpha = (alpha_cnt * 5 >= n_tok * 4).cast("long")
    out = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_tok.alias("n_tok"),
        chars.alias("n_token_chars"),
        f_words.alias("f_words"),
        f_meanlen.alias("f_meanlen"),
        f_stop.alias("f_stop"),
        f_alpha.alias("f_alpha"),
    )
    return out.withColumn(
        "keep",
        (
            (F.col("f_words") == 1)
            & (F.col("f_meanlen") == 1)
            & (F.col("f_stop") == 1)
            & (F.col("f_alpha") == 1)
        ).cast("long"),
    )


_TOKS = DUCK_TOKENS.format(x="text")
_STOP_IN = ", ".join(f"'{w}'" for w in GQ_STOPWORDS)

_GQ_SQL = f"""
    WITH s AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(len({_TOKS}) AS BIGINT) AS n_tok,
               CAST(list_reduce(list_prepend(0,
                        list_transform({_TOKS}, t -> len(t))),
                    (a, b) -> a + b) AS BIGINT) AS n_token_chars,
               CAST(len(list_filter({_TOKS},
                        t -> t IN ({_STOP_IN}))) AS BIGINT) AS stop_cnt,
               CAST(len(list_filter({_TOKS},
                        t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS alpha_cnt
        FROM documents
    ),
    flags AS (
        SELECT doc_id, n_tok, n_token_chars,
               CAST(n_tok >= {GQ_WORDS_MIN} AND n_tok <= {GQ_WORDS_MAX}
                    AS BIGINT) AS f_words,
               CAST(n_token_chars >= {GQ_MEANLEN_LO} * n_tok
                    AND n_token_chars <= {GQ_MEANLEN_HI} * n_tok
                    AS BIGINT) AS f_meanlen,
               CAST(stop_cnt >= {GQ_STOP_MIN} AS BIGINT) AS f_stop,
               CAST(alpha_cnt * 5 >= n_tok * 4 AS BIGINT) AS f_alpha
        FROM s
    )
    SELECT doc_id, n_tok, n_token_chars, f_words, f_meanlen, f_stop, f_alpha,
           CAST(f_words = 1 AND f_meanlen = 1 AND f_stop = 1 AND f_alpha = 1
                AS BIGINT) AS keep
    FROM flags
"""


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def ring_points() -> tuple[list[int], list[int]]:
    """The (sorted point, owning node) ring — data-independent md5
    constants shared verbatim by the Spark plan and the DuckDB oracle."""
    pts = sorted(
        (_h32(f"ring|{node}.{v}"), node)
        for node in range(N_NODES)
        for v in range(N_VNODES)
    )
    return [p for p, _ in pts], [n for _, n in pts]


def q_ring_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash ring placement balance audit (see module
    docstring): per-node document counts."""
    pts, nodes = ring_points()
    n = len(pts)
    pts_arr = F.array([F.lit(p) for p in pts])
    nodes_arr = F.array([F.lit(x) for x in nodes])
    d = table(spark, sf_dir, "documents", spread=True)
    k = hex32(F.concat(F.lit("doc|"), F.col("doc_id").cast("string")))
    idxs = F.filter(
        F.sequence(F.lit(1), F.lit(n)),
        lambda i: F.element_at(pts_arr, i) >= k,
    )
    idx = F.coalesce(F.array_min(idxs), F.lit(1))
    assigned = d.select(
        F.element_at(nodes_arr, idx).cast("long").alias("node")
    )
    return assigned.groupBy("node").agg(
        F.count("*").cast("long").alias("n_docs")
    )


def _ring_sql() -> str:
    pts, nodes = ring_points()
    n = len(pts)
    pts_l = "[" + ", ".join(str(p) for p in pts) + "]"
    nodes_l = "[" + ", ".join(str(x) for x in nodes) + "]"
    k = DUCK_HEX32.format(x="'doc|' || CAST(doc_id AS VARCHAR)")
    return f"""
        WITH d AS (
            SELECT coalesce(
                       list_min(list_filter(generate_series(1, {n}),
                                i -> ({pts_l})[i] >= {k})),
                       1) AS idx
            FROM documents
        )
        SELECT CAST(({nodes_l})[idx] AS BIGINT) AS node,
               COUNT(*)::BIGINT AS n_docs
        FROM d GROUP BY 1
    """


QUERIES = {
    "gopher_quality": q_gopher_quality,
    "ring_assign": q_ring_assign,
}

ORACLES = {
    "gopher_quality": _GQ_SQL,
    "ring_assign": _ring_sql(),
}
