"""Sequence & text-metric ops, batch 11: ordered per-entity path
aggregation (LISTAGG), a deterministic readability score, rank-biased
overlap between retrieval rankings, and hapax-ratio novelty scoring.

Scale design (100 TB):
- ``user_paths`` is the ordered-LISTAGG shape (user journey strings for
  funnel/sequence mining): ONE groupBy on the entity key; the ordering
  happens inside the aggregated value (sort_array over collected
  structs == DuckDB ``string_agg(... ORDER BY ...)``), so no global
  sort and no window pass precedes the aggregate.
- ``readability`` is a per-row expression (three regexp counts + fixed
  arithmetic) — whole-stage codegen, zero shuffles; the quality-gate
  class of op a curation pipeline runs on every document.
- ``rbo_overlap`` compares two rankings of the same candidates
  (rank-biased overlap, Webber et al. 2010, truncated at depth 50):
  rankings are per-query windows (never global), the top-50 lists
  collapse to two 50-element arrays per query, and the RBO sum is a
  sequential fold with PRECOMPUTED weight literals (identical decimal
  text parsed by both engines) — no cross-engine pow() drift.
- ``hapax_ratio`` joins each document's distinct tokens against the
  corpus document-frequency table (keyed equi-join, partial-agg
  map-side): the novelty signal that flags near-gibberish (all-hapax)
  and boilerplate (no-hapax) tails for curation.

Reference parity: no counterpart in the reference (builder-brief
training-data-pipeline extensions; same family as textops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import DUCK_TOKENS, table, tokens

RBO_P = 0.9  # rank-biased overlap persistence
RBO_D = 50  # truncation depth
RBO_PROBES = ["the", "data", "merge", "batch"]
# (1-p) * p^(d-1) for d = 1..D, computed once in Python by repeated
# multiplication; repr() round-trips so both engines parse the SAME double.
RBO_W = []
_w = 1.0 - RBO_P
for _ in range(RBO_D):
    RBO_W.append(_w)
    _w *= RBO_P


def q_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user chronological event-type path (ordered LISTAGG):
    '>'-joined event_type in (ts, event_id) order, plus event count.
    One entity-keyed aggregate; ordering is intra-group."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    rows = e.select(
        "user_id",
        F.struct(
            F.col("ts").alias("ts"),
            F.col("event_id").alias("event_id"),
            F.coalesce("event_type", F.lit("?")).alias("et"),
        ).alias("s"),
    )
    return rows.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(F.collect_list("s")), lambda s: s["et"]
            ),
        ).alias("path"),
    )


_USER_PATHS_SQL = """
    SELECT user_id,
           count(*)::BIGINT AS n_events,
           string_agg(coalesce(event_type, '?'), '>'
                      ORDER BY ts, event_id, coalesce(event_type, '?'))
               AS path
    FROM events
    WHERE user_id IS NOT NULL
    GROUP BY user_id
"""


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Flesch-style readability proxy: sentences =
    [.!?]+ runs (min 1), words = whitespace tokens, 'syllables' =
    vowel-group runs. score = 206.835 - 1.015*(w/s) - 84.6*(v/w),
    fixed parenthesization, rounded to 3. Pure map-side expression."""
    d = table(spark, sf_dir, "documents", spread=True)
    n_words = F.size(tokens(F.col("text")))
    d = d.filter(n_words >= 1).select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.greatest(
            F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
        )
        .cast("long")
        .alias("n_sents"),
        F.regexp_count(F.lower(F.col("text")), F.lit("[aeiou]+"))
        .cast("long")
        .alias("n_vgroups"),
    )
    w = F.col("n_words").cast("double")
    s = F.col("n_sents").cast("double")
    v = F.col("n_vgroups").cast("double")
    return d.withColumn(
        "flesch",
        F.round(
            F.lit(206.835) - F.lit(1.015) * (w / s) - F.lit(84.6) * (v / w), 3
        ),
    )


_READABILITY_SQL = f"""
    WITH t AS (
        SELECT doc_id,
               len({DUCK_TOKENS.format(x='text')})::BIGINT AS n_words,
               greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT
                   AS n_sents,
               len(regexp_extract_all(lower(text), '[aeiou]+'))::BIGINT
                   AS n_vgroups
        FROM documents
    )
    SELECT doc_id, n_words, n_sents, n_vgroups,
           round(
               206.835
               - 1.015 * (n_words::DOUBLE / n_sents::DOUBLE)
               - 84.6 * (n_vgroups::DOUBLE / n_words::DOUBLE),
               3
           ) AS flesch
    FROM t WHERE n_words >= 1
"""


def q_rbo_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (p=0.9, truncated depth 10) between the
    tf-ranking and the first-position-ranking of each probe token's
    candidate documents — 'how much do my two retrieval strategies
    agree, top-weighted'. Per-query windows produce two top-50 id
    arrays; RBO is a sequential fold with precomputed weight literals
    so both engines accumulate identical doubles."""
    d = table(spark, sf_dir, "documents", spread=True)
    tk = d.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    ).filter(F.col("tok").isin(RBO_PROBES))
    g = tk.groupBy("tok", "doc_id").agg(
        F.count("*").alias("tf"), F.min("pos").alias("fpos")
    )
    w1 = Window.partitionBy("tok").orderBy(F.desc("tf"), F.asc("doc_id"))
    w2 = Window.partitionBy("tok").orderBy(F.asc("fpos"), F.asc("doc_id"))
    r = g.select(
        "tok",
        "doc_id",
        F.row_number().over(w1).alias("r1"),
        F.row_number().over(w2).alias("r2"),
    )
    lists = r.groupBy("tok").agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("r1") <= RBO_D,
                        F.struct(
                            F.col("r1").alias("r"), F.col("doc_id").alias("id")
                        ),
                    )
                )
            ),
            lambda s: s["id"],
        ).alias("a"),
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("r2") <= RBO_D,
                        F.struct(
                            F.col("r2").alias("r"), F.col("doc_id").alias("id")
                        ),
                    )
                )
            ),
            lambda s: s["id"],
        ).alias("b"),
    )
    warr = F.array(*[F.lit(w) for w in RBO_W])
    depth = F.least(F.lit(RBO_D), F.size("a"), F.size("b"))
    # guard depth=0: Spark sequence(1, 0) DESCENDS ([1, 0]); DuckDB
    # generate_series(1, 0) is empty — fold only when depth >= 1.
    rbo = F.when(depth < 1, F.lit(0.0)).otherwise(
        F.aggregate(
            F.sequence(F.lit(1), depth),
            F.lit(0.0),
            lambda acc, i: acc
            + F.element_at(warr, i)
            * (
                F.size(
                    F.array_intersect(F.slice("a", 1, i), F.slice("b", 1, i))
                ).cast("double")
                / i.cast("double")
            ),
        )
    )
    return lists.select(
        F.col("tok").alias("token"),
        F.size(
            F.array_intersect(
                F.slice("a", 1, depth), F.slice("b", 1, depth)
            )
        )
        .cast("long")
        .alias("overlap_at_d"),
        rbo.alias("rbo"),
    )


_RBO_PROBES_SQL = ", ".join(f"'{t}'" for t in RBO_PROBES)
# scientific notation so DuckDB binds each element as DOUBLE directly:
# plain decimal literals unify to DECIMAL(20,19)[] and the DECIMAL->DOUBLE
# cast is NOT correctly rounded (1-ulp drift vs strtod on the same digits)
_RBO_W_SQL = "[" + ", ".join(f"{w:.17e}" for w in RBO_W) + "]"

_RBO_SQL = f"""
    WITH t AS (
        SELECT doc_id, {DUCK_TOKENS.format(x='text')} AS toks FROM documents
    ),
    ix AS (
        SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t
    ),
    tk AS (
        SELECT doc_id, toks[i] AS tok, i FROM ix
        WHERE toks[i] IN ({_RBO_PROBES_SQL})
    ),
    g AS (
        SELECT tok, doc_id, count(*)::BIGINT AS tf, min(i) AS fpos
        FROM tk GROUP BY tok, doc_id
    ),
    r AS (
        SELECT tok, doc_id,
               row_number() OVER (
                   PARTITION BY tok ORDER BY tf DESC, doc_id ASC
               ) AS r1,
               row_number() OVER (
                   PARTITION BY tok ORDER BY fpos ASC, doc_id ASC
               ) AS r2
        FROM g
    ),
    lists AS (
        SELECT tok,
               list(doc_id ORDER BY r1) FILTER (WHERE r1 <= {RBO_D}) AS a,
               list(doc_id ORDER BY r2) FILTER (WHERE r2 <= {RBO_D}) AS b
        FROM r GROUP BY tok
    ),
    z AS (
        SELECT tok, a, b,
               least({RBO_D}, len(a), len(b)) AS depth
        FROM lists
    )
    SELECT tok AS token,
           len(list_intersect(a[1:depth], b[1:depth]))::BIGINT AS overlap_at_d,
           list_reduce(
               -- prepending the 0.0 init makes the fold variable DOUBLE;
               -- i is an exact small integer, so i::BIGINT restores it
               list_prepend(0.0::DOUBLE, generate_series(1, depth)),
               (acc, i) -> acc
                   + ({_RBO_W_SQL}::DOUBLE[])[i::BIGINT]
                   * (len(list_intersect(a[1:(i::BIGINT)],
                                         b[1:(i::BIGINT)]))::DOUBLE / i)
           ) AS rbo
    FROM z
"""


def q_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomenon ratio per document: the fraction of a doc's
    DISTINCT tokens that occur in exactly one document corpus-wide.
    Distinct (doc, token) pairs → document-frequency table → keyed
    equi-join back. High ratio flags gibberish/OCR noise; zero flags
    boilerplate. One exact division."""
    d = table(spark, sf_dir, "documents", spread=True)
    dt = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    ).distinct()
    df_t = dt.groupBy("tok").agg(F.count("*").alias("df"))
    per = (
        dt.join(df_t, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_distinct"),
            F.sum((F.col("df") == 1).cast("long")).alias("n_hapax"),
        )
    )
    return per.select(
        "doc_id",
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("n_hapax").cast("long").alias("n_hapax"),
        (
            F.col("n_hapax").cast("double") / F.col("n_distinct").cast("double")
        ).alias("hapax_ratio"),
    )


_HAPAX_SQL = f"""
    WITH t AS (
        SELECT doc_id, {DUCK_TOKENS.format(x='text')} AS toks FROM documents
    ),
    dt AS (SELECT DISTINCT doc_id, unnest(toks) AS tok FROM t),
    dft AS (SELECT tok, count(*)::BIGINT AS df FROM dt GROUP BY tok)
    SELECT dt.doc_id,
           count(*)::BIGINT AS n_distinct,
           sum((dft.df = 1)::BIGINT)::BIGINT AS n_hapax,
           sum((dft.df = 1)::BIGINT)::DOUBLE / count(*)::DOUBLE AS hapax_ratio
    FROM dt JOIN dft ON dft.tok = dt.tok
    GROUP BY dt.doc_id
"""


KW_TOP = 3  # keywords kept per document


def q_doc_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 tokens by tf·idf — the
    map-side feature a curation pipeline attaches before clustering /
    topic mixing. Integer-exact: idf6 = floor(1e6·N/df) (one integer
    division), score = tf·idf6 (int64), so ranking never compares
    drifting floats. Plan: one (doc,tok) count, one vocabulary-sized df
    aggregate broadcast back, corpus size N as a 1-row broadcast cross,
    and the per-doc top-3 is a WindowGroupLimit partitioned by doc —
    never a global sort."""
    d = table(spark, sf_dir, "documents", spread=True)
    tf = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(n))
        .withColumn("score", F.expr("tf * (n_docs * 1000000L div df)"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("tok")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KW_TOP)
        .select(
            "doc_id",
            F.col("rank").cast("long").alias("rank"),
            F.col("tok").alias("keyword"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("score").cast("long").alias("score"),
        )
    )


_KW_SQL = f"""
    WITH tf AS (
        SELECT doc_id, tok, count(*)::BIGINT AS tf FROM (
            SELECT doc_id, unnest({DUCK_TOKENS.format(x='text')}) AS tok
            FROM documents
        ) GROUP BY doc_id, tok
    ),
    dfreq AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY tok),
    n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
    scored AS (
        SELECT doc_id, tok, tf, df,
               tf * ((n_docs * 1000000) // df) AS score
        FROM tf JOIN dfreq USING (tok) CROSS JOIN n
    )
    SELECT doc_id, rank, tok AS keyword, tf, df, score FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, tok ASC
        )::BIGINT AS rank
        FROM scored
    ) WHERE rank <= {KW_TOP}
"""


QUERIES = {
    "user_paths": q_user_paths,
    "readability": q_readability,
    "rbo_overlap": q_rbo_overlap,
    "hapax_ratio": q_hapax_ratio,
    "doc_tfidf_keywords": q_doc_tfidf_keywords,
}

ORACLES = {
    "user_paths": _USER_PATHS_SQL,
    "readability": _READABILITY_SQL,
    "rbo_overlap": _RBO_SQL,
    "hapax_ratio": _HAPAX_SQL,
    "doc_tfidf_keywords": _KW_SQL,
}


# ---------------------------------------------------------------- batch 31

NDCG_K = 10
# 1/log2(r+1) gain discounts, precomputed so both engines use the SAME
# double literals (no libm log at query time)
NDCG_W = [1.0 / __import__("math").log2(r + 1) for r in range(1, NDCG_K + 1)]


def q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the tf-ranking against first-position-derived graded
    relevance (rel 3/2/1 for fpos ≤20 / ≤100 / else) for each probe
    token — THE standard ranking-quality metric, closing the IR-eval
    family (rrf_fusion, rbo_overlap, ann_recall). DCG and the ideal DCG
    are sequential folds over the per-query top-10 arrays with
    precomputed discount literals, so both engines accumulate identical
    doubles; everything before the fold is one (tok, doc) aggregate +
    one rank window (WindowGroupLimit prunes map-side)."""
    d = table(spark, sf_dir, "documents", spread=True)
    tk = d.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    ).filter(F.col("tok").isin(RBO_PROBES))
    g = tk.groupBy("tok", "doc_id").agg(
        F.count("*").alias("tf"), (F.min("pos") + 1).alias("fpos")
    )
    rel = (
        F.when(F.col("fpos") <= 20, 3)
        .when(F.col("fpos") <= 100, 2)
        .otherwise(1)
        .cast("long")
    )
    w1 = Window.partitionBy("tok").orderBy(F.desc("tf"), F.asc("doc_id"))
    top = (
        g.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= NDCG_K)
        .select("tok", "r1", rel.alias("rel"))
    )
    warr = F.array(*[F.lit(w) for w in NDCG_W])
    lists = top.groupBy("tok").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("r1", "rel"))),
            lambda s: s["rel"],
        ).alias("rels")
    )

    def fold(arr):
        return F.aggregate(
            F.sequence(F.lit(1), F.size(arr)),
            F.lit(0.0),
            lambda acc, i: acc
            + F.element_at(warr, i) * F.element_at(arr, i).cast("double"),
        )

    ideal = F.reverse(F.array_sort(F.col("rels")))
    return lists.select(
        F.col("tok").alias("token"),
        F.size("rels").cast("long").alias("depth"),
        fold(F.col("rels")).alias("dcg"),
        fold(ideal).alias("idcg"),
        (fold(F.col("rels")) / fold(ideal)).alias("ndcg"),
    )


_NDCG_W_SQL = "[" + ", ".join(f"{w:.17e}" for w in NDCG_W) + "]"

_NDCG_SQL = f"""
    WITH t AS (
        SELECT doc_id, {DUCK_TOKENS.format(x='text')} AS toks FROM documents
    ),
    ix AS (
        SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t
    ),
    tk AS (
        SELECT doc_id, toks[i] AS tok, i FROM ix
        WHERE toks[i] IN ({_RBO_PROBES_SQL})
    ),
    g AS (
        SELECT tok, doc_id, count(*)::BIGINT AS tf, min(i) AS fpos
        FROM tk GROUP BY tok, doc_id
    ),
    top AS (
        SELECT tok,
               row_number() OVER (
                   PARTITION BY tok ORDER BY tf DESC, doc_id ASC
               ) AS r1,
               CAST(CASE WHEN fpos <= 20 THEN 3
                         WHEN fpos <= 100 THEN 2 ELSE 1 END AS BIGINT) AS rel
        FROM g
        QUALIFY r1 <= {NDCG_K}
    ),
    lists AS (
        SELECT tok, list(rel ORDER BY r1) AS rels FROM top GROUP BY tok
    )
    SELECT tok AS token,
           len(rels)::BIGINT AS depth,
           list_reduce(
               list_prepend(0.0::DOUBLE, generate_series(1, len(rels))),
               (acc, i) -> acc + ({_NDCG_W_SQL}::DOUBLE[])[i::BIGINT]
                   * rels[i::BIGINT]::DOUBLE
           ) AS dcg,
           list_reduce(
               list_prepend(0.0::DOUBLE, generate_series(1, len(rels))),
               (acc, i) -> acc + ({_NDCG_W_SQL}::DOUBLE[])[i::BIGINT]
                   * (list_reverse(list_sort(rels)))[i::BIGINT]::DOUBLE
           ) AS idcg,
           list_reduce(
               list_prepend(0.0::DOUBLE, generate_series(1, len(rels))),
               (acc, i) -> acc + ({_NDCG_W_SQL}::DOUBLE[])[i::BIGINT]
                   * rels[i::BIGINT]::DOUBLE
           ) / list_reduce(
               list_prepend(0.0::DOUBLE, generate_series(1, len(rels))),
               (acc, i) -> acc + ({_NDCG_W_SQL}::DOUBLE[])[i::BIGINT]
                   * (list_reverse(list_sort(rels)))[i::BIGINT]::DOUBLE
           ) AS ndcg
    FROM lists
"""

QUERIES["ndcg"] = q_ndcg
ORACLES["ndcg"] = _NDCG_SQL


# ---------------------------------------------------------------- batch 35

MOJI_MARKERS = ("Ã", "â€", "ï¿½", "Â ", "�")
MOJI_PPM_DEN = 1_000_000


def q_mojibake_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-damage (mojibake) detector — the curation gate that
    catches UTF-8-decoded-as-Latin-1 double encoding ('Ã©', 'â€™'),
    replacement-char damage (U+FFFD / its Latin-1 ghost 'ï¿½') and
    NBSP ghosts ('Â '): a web-scale corpus always contains a tail of
    mis-declared charsets, and n-gram LM or classifier filters score
    such text as fluent garbage rather than rejecting it. Marker counts
    are exact substring counts ((len - len(replace(s, m, ''))) /
    len(m) — pure codegen, zero shuffles, no regex engine in the hot
    path); the score is integer parts-per-million of damaged marker
    chars. The synthetic corpus is clean, so damage is INJECTED
    deterministically first (doc_id % 7 → 'Ã©' double-encoding,
    doc_id % 11 → replacement chars) — both engines transform
    identically, making the detector's arithmetic the thing under
    test."""
    d = table(spark, sf_dir, "documents")
    damaged = F.when(
        F.col("doc_id") % 7 == 0, F.expr("replace(text, 'e', 'Ã©')")
    ).when(
        F.col("doc_id") % 11 == 0, F.expr("replace(text, 'o', 'ï¿½')")
    ).otherwise(F.col("text"))
    d = d.select("doc_id", damaged.alias("t"))
    hits = None
    for m in MOJI_MARKERS:
        esc = m.replace("'", "''")
        c = (
            F.length("t") - F.length(F.expr(f"replace(t, '{esc}', '')"))
        ) / len(m)
        h = (c.cast("long") * len(m)).cast("long")  # damaged chars
        hits = h if hits is None else hits + h
    out = d.select(
        "doc_id",
        hits.alias("damage_chars"),
        F.floor(hits * MOJI_PPM_DEN / F.greatest(F.length("t"), F.lit(1)))
        .cast("long")
        .alias("damage_ppm"),
    )
    return out.filter(F.col("damage_chars") > 0)


def _moji_sql() -> str:
    hit_terms = []
    for m in MOJI_MARKERS:
        esc = m.replace("'", "''")
        hit_terms.append(
            f"(CAST((length(t) - length(replace(t, '{esc}', ''))) "
            f"/ {len(m)} AS BIGINT) * {len(m)})"
        )
    hits = " + ".join(hit_terms)
    return f"""
    WITH dmg AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN replace(text, 'e', 'Ã©')
                    WHEN doc_id % 11 = 0 THEN replace(text, 'o', 'ï¿½')
                    ELSE text END AS t
        FROM documents
    )
    SELECT doc_id, {hits} AS damage_chars,
           CAST(floor(({hits}) * {MOJI_PPM_DEN}.0
                      / greatest(length(t), 1)) AS BIGINT) AS damage_ppm
    FROM dmg
    WHERE {hits} > 0
"""


QUERIES["mojibake_score"] = q_mojibake_score
ORACLES["mojibake_score"] = _moji_sql()


# ---------------------------------------------------------------- batch 39

PRK_K = 10
PRK_REL_FPOS = 100  # binary relevance: token appears in the first 100 tokens


def q_pr_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision@k / recall@k of the tf-ranking against binary
    relevance (token within the first PRK_REL_FPOS positions) — the
    set-based half of the IR-eval family next to ndcg's graded
    ranking. All counts are exact integers; precision/recall are
    integer parts-per-thousand with fixed denominators (k, |rel|), so
    no float crosses an ORDER BY. One (tok, doc) aggregate + one
    per-token rank window (WindowGroupLimit prunes map-side), then two
    tiny per-token aggregates."""
    d = table(spark, sf_dir, "documents", spread=True)
    tk = d.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    ).filter(F.col("tok").isin(RBO_PROBES))
    g = tk.groupBy("tok", "doc_id").agg(
        F.count("*").alias("tf"), (F.min("pos") + 1).alias("fpos")
    )
    rel = (F.col("fpos") <= PRK_REL_FPOS).cast("long")
    w = Window.partitionBy("tok").orderBy(F.desc("tf"), F.asc("doc_id"))
    ranked = g.withColumn("r1", F.row_number().over(w)).withColumn("rel", rel)
    hits = (
        ranked.filter(F.col("r1") <= PRK_K)
        .groupBy("tok")
        .agg(F.sum("rel").alias("hits"))
    )
    nrel = ranked.groupBy("tok").agg(F.sum("rel").alias("n_rel"))
    return hits.join(nrel, "tok").select(
        "tok", "hits", "n_rel",
        F.floor(F.col("hits") * 1000 / PRK_K).cast("long").alias("precision_ppk"),
        F.floor(F.col("hits") * 1000 / F.greatest(F.col("n_rel"), F.lit(1)))
        .cast("long").alias("recall_ppk"),
    )


_PRK_PROBES_SQL = ", ".join(f"'{p}'" for p in RBO_PROBES)

ORACLES["pr_at_k"] = f"""
    WITH t AS (
        SELECT doc_id, {DUCK_TOKENS.format(x="text")} AS toks FROM documents
    ),
    ix AS (
        SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t
    ),
    tk AS (
        SELECT doc_id, toks[i] AS tok, i FROM ix
        WHERE toks[i] IN ({_PRK_PROBES_SQL})
    ),
    g AS (
        SELECT tok, doc_id, count(*) AS tf, min(i) AS fpos
        FROM tk GROUP BY tok, doc_id
    ),
    ranked AS (
        SELECT tok, doc_id,
               CASE WHEN fpos <= {PRK_REL_FPOS} THEN 1 ELSE 0 END AS rel,
               row_number() OVER (PARTITION BY tok
                                  ORDER BY tf DESC, doc_id ASC) AS r1
        FROM g
    )
    SELECT h.tok, h.hits, n.n_rel,
           CAST(floor(h.hits * 1000.0 / {PRK_K}) AS BIGINT) AS precision_ppk,
           CAST(floor(h.hits * 1000.0 / greatest(n.n_rel, 1))
                AS BIGINT) AS recall_ppk
    FROM (SELECT tok, CAST(sum(rel) AS BIGINT) AS hits
          FROM ranked WHERE r1 <= {PRK_K} GROUP BY tok) h
    JOIN (SELECT tok, CAST(sum(rel) AS BIGINT) AS n_rel
          FROM ranked GROUP BY tok) n ON h.tok = n.tok
"""

QUERIES["pr_at_k"] = q_pr_at_k
