"""Search-box operators, batch 104: SymSpell spelling correction via
delete-key blocking, and prefix autocomplete table construction — the
two query-understanding ops in front of every search/retrieval stack.

Scale design (100 TB):
- ``symspell_correct``: the SymSpell insight made Spark-shaped — two
  strings are within edit distance 1 only if they share a key in
  {s} ∪ deletes1(s), so candidate generation is an EQUI-JOIN of the
  query delete-key table against the vocabulary delete-key table
  (each side ~|s| keys per string, generated map-side by a transform/
  explode), never an all-pairs edit-distance scan — the same
  cross-kill discipline as lpm_join/soundex_block. Candidates are then
  VERIFIED with the built-in ``levenshtein`` (identical semantics in
  Spark and DuckDB — plain Levenshtein, no transposition) and ranked
  by corpus frequency (argmax on the (freq, word) max-struct);
  no-candidate queries survive via left join with a sentinel.
- ``prefix_autocomplete``: the type-ahead table — every (prefix,
  word) pair from a map-side prefix explode of the frequency-ranked
  vocabulary, one window per prefix keeps TOP_SUGGEST suggestions
  (freq desc, word asc — fully deterministic). Output is
  Σ|word|-bounded; the window key is the prefix so 10^9-word vocabs
  partition cleanly.
- Misspelled queries are synthesized deterministically per doc
  (delete / duplicate / substitute-with-'z' by doc_id % 4, 'z' being
  outside every corpus word so substitutions are guaranteed
  off-vocabulary; % 4 == 3 keeps the token exact for the
  already-correct path, and % 8 == 6 plants a DOUBLE 'z' — distance 2,
  so the no-correction sentinel path is actually exercised).

Reference parity: no search layer in the reference; completes the IR
family (postings, phrase_search, bm25_topk, rrf_fusion, rocchio)
with the query-understanding front end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import DUCK_TOKENS, table, tokens

TOP_SUGGEST = 3
NO_MATCH = ""  # correction sentinel for unmatched queries


def _vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq) corpus vocabulary."""
    d = table(spark, sf_dir, "documents", spread=True)
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


_VOCAB_SQL = f"""
    SELECT word, count(*)::BIGINT AS freq FROM (
        SELECT unnest({DUCK_TOKENS.format(x='text')}) AS word
        FROM documents
    ) GROUP BY word
"""


def _del1(col):
    """Array of the string and all its single-character deletions."""
    return F.concat(
        F.array(col),
        F.transform(
            F.sequence(F.lit(1).cast("long"), F.length(col).cast("long")),
            lambda i: F.concat(
                F.substr(col, F.lit(1), i - 1), F.substr(col, i + 1)
            ),
        ),
    )


_DEL1_SQL = (
    "list_prepend({x}, list_transform(generate_series(1, len({x})), "
    "i -> substr({x}, 1, CAST(i - 1 AS BIGINT)) "
    "|| substr({x}, CAST(i + 1 AS BIGINT))))"
)


def _queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-doc query token, misspelled by doc_id % 4."""
    d = table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    base = F.get(tokens(F.col("text")), (did % 7).cast("int"))
    pos = (did % F.length(base)).cast("int")  # 0-based edit position
    op = did % 4
    q = (
        F.when(
            op == 0,  # delete char at pos
            F.concat(
                F.substr(base, F.lit(1), pos), F.substr(base, pos + 2)
            ),
        )
        .when(
            op == 1,  # duplicate char at pos (insertion)
            F.concat(
                F.substr(base, F.lit(1), pos + 1), F.substr(base, pos + 1)
            ),
        )
        .when(
            (op == 2) & (did % 8 == 6),  # 'zz' → distance 2, no match
            F.concat(
                F.substr(base, F.lit(1), pos),
                F.lit("zz"),
                F.substr(base, pos + 3),
            ),
        )
        .when(
            op == 2,  # substitute with 'z' (never in the corpus)
            F.concat(
                F.substr(base, F.lit(1), pos),
                F.lit("z"),
                F.substr(base, pos + 2),
            ),
        )
        .otherwise(base)  # already correct
    )
    return d.select("doc_id", q.alias("q")).filter(
        F.col("q").isNotNull() & (F.length("q") >= 1)
    )


_QUERIES_SQL = """
    SELECT doc_id, q FROM (
        SELECT doc_id,
               CASE WHEN doc_id % 8 = 6
                    THEN substr(base, 1, pos) || 'zz'
                         || substr(base, pos + 3)
                    WHEN doc_id % 4 = 0
                    THEN substr(base, 1, pos) || substr(base, pos + 2)
                    WHEN doc_id % 4 = 1
                    THEN substr(base, 1, pos + 1)
                         || substr(base, pos + 1)
                    WHEN doc_id % 4 = 2
                    THEN substr(base, 1, pos) || 'z'
                         || substr(base, pos + 2)
                    ELSE base
               END AS q
        FROM (
            SELECT doc_id, base,
                   CAST(doc_id % len(base) AS BIGINT) AS pos
            FROM (
                SELECT doc_id,
                       toks[CAST(doc_id % 7 + 1 AS BIGINT)] AS base
                FROM (
                    SELECT doc_id,
                           {toks} AS toks
                    FROM documents
                )
            ) WHERE base IS NOT NULL
        )
    ) WHERE q IS NOT NULL AND len(q) >= 1
""".format(toks=DUCK_TOKENS.format(x="text"))


def q_symspell_correct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best edit-distance-≤1 correction per query (module doc). Emits
    (doc_id, q, correction, dist, freq)."""
    vocab = _vocab(spark, sf_dir)
    vk = vocab.select(
        "word", "freq", F.explode(_del1(F.col("word"))).alias("key")
    )
    qs = _queries(spark, sf_dir)
    qk = qs.select(
        "doc_id", "q", F.explode(_del1(F.col("q"))).alias("key")
    )
    cand = (
        qk.join(vk, "key")
        .select("doc_id", "q", "word", "freq")
        .distinct()
        .filter(F.levenshtein("q", "word") <= 1)
    )
    best = cand.groupBy("doc_id").agg(
        F.max(F.struct("freq", "word")).alias("m")
    ).select(
        "doc_id",
        F.col("m.word").alias("correction"),
        F.col("m.freq").alias("freq"),
    )
    return (
        qs.join(best, "doc_id", "left")
        .select(
            "doc_id",
            "q",
            F.coalesce("correction", F.lit(NO_MATCH)).alias("correction"),
            F.when(
                F.col("correction").isNull(), F.lit(-1).cast("long")
            )
            .otherwise(
                F.levenshtein("q", F.col("correction")).cast("long")
            )
            .alias("dist"),
            F.coalesce("freq", F.lit(-1)).cast("long").alias("freq"),
        )
        .orderBy("doc_id")
    )


_SYMSPELL_SQL = f"""
WITH vocab AS ({_VOCAB_SQL}),
qs AS ({_QUERIES_SQL}),
vk AS (
    SELECT word, freq, unnest({_DEL1_SQL.format(x='word')}) AS key
    FROM vocab
),
qk AS (
    SELECT doc_id, q, unnest({_DEL1_SQL.format(x='q')}) AS key
    FROM qs
),
cand AS (
    SELECT DISTINCT doc_id, q, word, freq
    FROM qk JOIN vk USING (key)
    WHERE levenshtein(q, word) <= 1
),
best AS (
    SELECT doc_id,
           max(struct_pack(freq := freq, word := word)) AS m
    FROM cand GROUP BY doc_id
)
SELECT qs.doc_id, qs.q,
       COALESCE(m.word, '{NO_MATCH}') AS correction,
       CASE WHEN m.word IS NULL THEN CAST(-1 AS BIGINT)
            ELSE levenshtein(qs.q, m.word)::BIGINT END AS dist,
       COALESCE(m.freq, -1)::BIGINT AS freq
FROM qs LEFT JOIN best ON best.doc_id = qs.doc_id
ORDER BY qs.doc_id
"""


def q_prefix_autocomplete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-TOP_SUGGEST completions per prefix (module doc)."""
    vocab = _vocab(spark, sf_dir)
    pfx = vocab.select(
        "word",
        "freq",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1).cast("long"), F.length("word").cast("long")
                ),
                lambda i: F.substr(F.col("word"), F.lit(1), i),
            )
        ).alias("prefix"),
    )
    w = Window.partitionBy("prefix").orderBy(
        F.col("freq").desc(), F.col("word")
    )
    return (
        pfx.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_SUGGEST)
        .select(
            "prefix",
            F.col("rank").cast("long").alias("rank"),
            "word",
            F.col("freq").cast("long").alias("freq"),
        )
        .orderBy("prefix", "rank")
    )


_AUTOCOMPLETE_SQL = f"""
WITH vocab AS ({_VOCAB_SQL}),
pfx AS (
    SELECT word, freq,
           unnest(list_transform(generate_series(1, len(word)),
                                 i -> substr(word, 1, CAST(i AS BIGINT))))
               AS prefix
    FROM vocab
),
ranked AS (
    SELECT prefix, word, freq,
           row_number() OVER (PARTITION BY prefix
                              ORDER BY freq DESC, word) AS rank
    FROM pfx
)
SELECT prefix, rank::BIGINT AS rank, word, freq
FROM ranked WHERE rank <= {TOP_SUGGEST}
ORDER BY prefix, rank
"""


QUERIES = {
    "symspell_correct": q_symspell_correct,
    "prefix_autocomplete": q_prefix_autocomplete,
}

ORACLES = {
    "symspell_correct": _SYMSPELL_SQL,
    "prefix_autocomplete": _AUTOCOMPLETE_SQL,
}
