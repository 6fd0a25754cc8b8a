"""Training-data curation operators, batch 4: CCNet-style perplexity
bucketing, PMI collocation statistics, text normalization, and URL
canonicalization + dedup.

Scale design (100 TB):
- ``ccnet_buckets`` is the CCNet head/middle/tail split (Wenzek et al.
  2020): per-language terciles over the unigram-LM commonness score.
  The vocabulary aggregate is one token-keyed shuffle; the per-language
  ntile is a window over doc-sized rows keyed by language (≤ a few
  hundred partitions at any corpus size, each independently sortable —
  the same shape CCNet itself shards by language). Ties break on doc_id
  so the tercile boundary is deterministic.
- ``cooc_pmi`` layers exact PMI-ratio statistics on the word2vec
  counting pass (``cooccurrence``): pair/unigram counts are integer
  aggregates; the two corpus totals are 1-row aggregates broadcast back;
  the ratio is a fixed-parenthesization chain of IEEE divisions (every
  op exactly rounded → bit-identical across engines, no libm log — the
  log is monotone in the ratio, so thresholding/ranking downstream is
  unaffected).
- ``text_normalize`` is entirely map-side (lowercase → token edge-strip
  → adjacent-duplicate collapse → whitespace squeeze), the cheap
  normalization pass every pipeline runs before hashing/dedup. Output
  carries the md5 of the normalized text so dedup can chain directly.
- ``url_dedup`` canonicalizes URLs (case-fold scheme+host, drop default
  ports, fragments, utm_* tracking params, trailing slashes) and counts
  variants per canonical form — the crawl-frontier dedup that runs
  before any fetch at web scale. Map-side regexp chain + one
  canonical-URL-keyed groupBy (hot URLs are exactly the skewed keys the
  salted-agg pattern in plans/skew.py handles unchanged).

Parity discipline: Spark regexp_replace is global by default and uses
``$n`` backrefs; the DuckDB oracles pass the ``'g'`` flag and use
``\\n`` — same RE2-safe patterns (no lookarounds, no backrefs in the
pattern itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import DUCK_TOKENS, table, tokens

PMI_MIN_PAIR = 5  # pair-count floor for cooc_pmi


# ---------------------------------------------------------------- ccnet_buckets


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail bucketing: score every document by
    mean corpus-frequency of its tokens (the integer-exact stand-in for
    LM perplexity — see ``lm_commonness``), then split each language
    into terciles by score. ``head`` is the most-common/boilerplate-like
    third, ``tail`` the rare/noisy third; CCNet trains on head+middle
    and audits tail. One token-keyed aggregate + broadcast join + one
    per-language window; docs with zero tokens drop out (no score)."""
    d = table(spark, sf_dir, "documents", spread=True)
    tf = d.select("doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok"))
    vocab = tf.groupBy("tok").agg(F.count("*").alias("cnt"))
    scored = (
        tf.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("n_tokens"), F.sum("cnt").alias("common_sum"))
        .withColumn(
            "mean_freq",
            F.col("common_sum").cast("double") / F.col("n_tokens"),
        )
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("mean_freq").desc(), F.col("doc_id")
    )
    t = F.ntile(3).over(w)
    return scored.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("common_sum").cast("long").alias("common_sum"),
        F.when(t == 1, "head").when(t == 2, "middle").otherwise("tail").alias(
            "bucket"
        ),
    )


# ---------------------------------------------------------------- cooc_pmi


def q_cooc_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation statistics over the ±2 skip-gram window (the
    classic collocation-extraction pass; Church & Hanks 1990). For each
    co-occurring pair with count ≥ PMI_MIN_PAIR, emit the exact integer
    counts and the PMI *ratio* p(x,y)/(p(x)p(y)) — computed as a fixed
    chain of IEEE divisions/multiplications, so Spark and the oracle are
    bit-identical without libm log. Plan: the pair groupBy (vocab²-
    bounded) and the unigram groupBy (vocab-bounded) are the only real
    shuffles; corpus totals are 1-row aggregates cross-joined back
    (broadcast); the unigram table broadcasts into the pair table."""
    from .curation import q_cooccurrence

    d = table(spark, sf_dir, "documents", spread=True)
    tf = d.select(F.explode(tokens(F.col("text"))).alias("tok"))
    uni = tf.groupBy("tok").agg(F.count("*").alias("c"))
    n_tok = uni.agg(F.sum("c").alias("n_tok"))
    pairs = q_cooccurrence(spark, sf_dir).filter(F.col("cnt") >= PMI_MIN_PAIR)
    n_pair = pairs.agg(F.sum("cnt").alias("n_pair_kept"))
    # totals over ALL pairs (not just kept) so the probability space is
    # the full window-pair distribution
    n_pair_all = (
        q_cooccurrence(spark, sf_dir).agg(F.sum("cnt").alias("n_pair"))
    )
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    j = (
        pairs.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_pair_all))
    )
    # ((cnt / n_pair) * n_tok / c1) * (n_tok / c2) — parenthesization is
    # part of the contract (each step exactly rounded IEEE double)
    ratio = (
        (F.col("cnt").cast("double") / F.col("n_pair"))
        * F.col("n_tok")
        / F.col("c1")
    ) * (F.col("n_tok").cast("double") / F.col("c2"))
    return j.select(
        "w1",
        "w2",
        F.col("cnt").cast("long").alias("cnt"),
        F.col("c1").cast("long").alias("c1"),
        F.col("c2").cast("long").alias("c2"),
        ratio.alias("pmi_ratio"),
    )


# ---------------------------------------------------------------- text_normalize


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic text normalization, entirely map-side: lowercase,
    strip non-alphanumeric token edges, drop emptied tokens, collapse
    ADJACENT duplicate tokens (the cheap half of Gopher's repetition
    cleanup), and re-join single-spaced. Emits before/after token counts
    and the md5 of the normalized text — the canonical key the exact-
    dedup pass hashes at 100 TB. A production variant adds NFKC and
    language-specific folding in the same transform slot; everything
    here is a whole-stage-codegen array expression (no shuffle at all
    before the sink)."""
    d = table(spark, sf_dir, "documents", spread=True)
    return (
        d.select("doc_id", tokens(F.lower(F.col("text"))).alias("t0"))
        .withColumn(
            "t1",
            F.filter(
                F.transform(
                    F.col("t0"),
                    lambda t: F.regexp_replace(
                        t, "^[^a-z0-9]+|[^a-z0-9]+$", ""
                    ),
                ),
                lambda t: t != "",
            ),
        )
        .withColumn(
            "t2", F.expr("filter(t1, (t, i) -> i = 0 OR t <> t1[i-1])")
        )
        .select(
            "doc_id",
            F.size("t0").cast("long").alias("n_before"),
            F.size("t2").cast("long").alias("n_after"),
            F.md5(F.concat_ws(" ", F.col("t2"))).alias("norm_md5"),
        )
    )


# ---------------------------------------------------------------- url_dedup


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + frontier dedup. Three deterministic URL
    variants per document (mixed-case host, explicit default port,
    trailing slash, utm_* tracking params, fragments — the mess a real
    crawl log contains) collapse under the canonical form: fragment
    stripped, utm_* params dropped, ``:80``/``:443`` removed,
    scheme+host lowercased, trailing slashes trimmed. One map-side
    regexp chain, one groupBy on the canonical URL."""
    d = table(spark, sf_dir, "documents", spread=True)
    did = F.col("doc_id")
    s = lambda c: c.cast("string")
    u1 = F.concat(
        F.lit("HTTP://Host"), s(did % 4), F.lit(".Example.COM:80/p/"), s(did)
    )
    u2 = F.concat(
        F.lit("http://host"), s(did % 4), F.lit(".example.com/p/"), s(did),
        F.lit("/"),
    )
    u3 = F.concat(
        F.lit("https://shop.example.org/item/"), s(did % 7),
        F.lit("?utm_source=feed&utm_campaign=c"), s(did % 3),
        F.lit("&ref="), s(did % 2), F.lit("#sec"), s(did % 5),
    )
    urls = d.select(
        "doc_id", F.explode(F.array(u1, u2, u3)).alias("url")
    )

    def canon(col):
        c = F.regexp_replace(col, "#.*", "")                      # fragment
        c = F.regexp_replace(c, "utm_[a-z]+=[^&#]*&?", "")        # tracking
        c = F.regexp_replace(c, r"\?&", "?")                      # tidy ?&
        c = F.regexp_replace(c, "[?&]+$", "")                     # bare ?/&
        head = F.regexp_extract(c, "^[a-zA-Z]+://[^/?#]+", 0)
        c = F.concat(
            F.lower(head), c.substr(F.length(head) + 1, F.lit(1 << 30))
        )                                                         # host case
        c = F.regexp_replace(c, "^(https?://[^/:]+):(80|443)($|/)", "$1$3")
        return F.regexp_replace(c, "/+$", "")                     # trail /

    return (
        urls.select("doc_id", canon(F.col("url")).alias("url_canon"))
        .groupBy("url_canon")
        .agg(
            F.count("*").alias("n_variants"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
    )


QUERIES = {
    "ccnet_buckets": q_ccnet_buckets,
    "cooc_pmi": q_cooc_pmi,
    "text_normalize": q_text_normalize,
    "url_dedup": q_url_dedup,
}

_TOKS = DUCK_TOKENS.format(x="text")

ORACLES = {}

ORACLES["ccnet_buckets"] = f"""
    WITH tf AS (
        SELECT doc_id, lang, unnest({_TOKS}) AS tok FROM documents
    ),
    v AS (SELECT tok, count(*) AS cnt FROM tf GROUP BY tok),
    s AS (
        SELECT tf.doc_id, tf.lang, count(*) AS n_tokens,
               sum(v.cnt) AS common_sum
        FROM tf JOIN v USING (tok)
        GROUP BY tf.doc_id, tf.lang
    )
    SELECT doc_id, lang, n_tokens::BIGINT AS n_tokens,
           common_sum::BIGINT AS common_sum,
           CASE ntile(3) OVER (
                    PARTITION BY lang
                    ORDER BY common_sum::DOUBLE / n_tokens DESC, doc_id)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
           END AS bucket
    FROM s
"""

ORACLES["cooc_pmi"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tf AS (
        SELECT doc_id, unnest(toks) AS tok,
               unnest(generate_series(1, len(toks))) AS pos
        FROM t
    ),
    pairs AS (
        SELECT a.tok AS w1, b.tok AS w2, count(*) AS cnt
        FROM tf a JOIN tf b
          ON a.doc_id = b.doc_id AND abs(a.pos - b.pos) BETWEEN 1 AND 2
        GROUP BY 1, 2
    ),
    uni AS (SELECT tok, count(*) AS c FROM tf GROUP BY tok),
    tot AS (
        SELECT (SELECT sum(c) FROM uni) AS n_tok,
               (SELECT sum(cnt) FROM pairs) AS n_pair
    )
    SELECT p.w1, p.w2, p.cnt::BIGINT AS cnt,
           u1.c::BIGINT AS c1, u2.c::BIGINT AS c2,
           ((p.cnt::DOUBLE / tot.n_pair) * tot.n_tok / u1.c)
               * (tot.n_tok::DOUBLE / u2.c) AS pmi_ratio
    FROM pairs p
    JOIN uni u1 ON u1.tok = p.w1
    JOIN uni u2 ON u2.tok = p.w2
    CROSS JOIN tot
    WHERE p.cnt >= {PMI_MIN_PAIR}
"""

ORACLES["text_normalize"] = f"""
    WITH t AS (
        SELECT doc_id,
               {DUCK_TOKENS.format(x="lower(text)")} AS t0
        FROM documents
    ),
    u AS (
        SELECT doc_id, t0,
               list_filter(
                   list_transform(
                       t0,
                       t -> regexp_replace(t, '^[^a-z0-9]+|[^a-z0-9]+$',
                                           '', 'g')),
                   t -> t <> '') AS t1
        FROM t
    ),
    v AS (
        SELECT doc_id, t0,
               list_filter(t1, (t, i) -> i = 1 OR t <> t1[i-1]) AS t2
        FROM u
    )
    SELECT doc_id, len(t0)::BIGINT AS n_before, len(t2)::BIGINT AS n_after,
           md5(array_to_string(t2, ' ')) AS norm_md5
    FROM v
"""

ORACLES["url_dedup"] = """
    WITH raw AS (
        SELECT doc_id, unnest([
            'HTTP://Host' || (doc_id % 4) || '.Example.COM:80/p/' || doc_id,
            'http://host' || (doc_id % 4) || '.example.com/p/' || doc_id
                || '/',
            'https://shop.example.org/item/' || (doc_id % 7)
                || '?utm_source=feed&utm_campaign=c' || (doc_id % 3)
                || '&ref=' || (doc_id % 2) || '#sec' || (doc_id % 5)
        ]) AS url
        FROM documents
    ),
    c1 AS (
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(url, '#.*', '', 'g'),
                           'utm_[a-z]+=[^&#]*&?', '', 'g'),
                       '\\?&', '?', 'g'),
                   '[?&]+$', '', 'g') AS u
        FROM raw
    ),
    c2 AS (
        SELECT doc_id,
               regexp_replace(
                   lower(regexp_extract(u, '^[a-zA-Z]+://[^/?#]+', 0))
                       || substr(u,
                                 length(regexp_extract(
                                     u, '^[a-zA-Z]+://[^/?#]+', 0)) + 1),
                   '^(https?://[^/:]+):(80|443)($|/)', '\\1\\3', 'g') AS u
        FROM c1
    )
    SELECT regexp_replace(u, '/+$', '', 'g') AS url_canon,
           count(*) AS n_variants,
           count(DISTINCT doc_id) AS n_docs
    FROM c2
    GROUP BY 1
"""
