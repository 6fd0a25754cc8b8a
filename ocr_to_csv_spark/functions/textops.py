"""Text-analysis operators for a training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting, exact dedup.

All heuristics are deterministic, JVM-side expressions (no Python UDFs) so
they survive whole-stage codegen at 100 TB; each has a DuckDB oracle with
identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import DUCK_HEX32, duck_ngrams, hex32, ngrams, table

# tiny per-language stopword lexicons (n-gram heuristic; deterministic)
_LEX = {
    "en": r"\b(the|a|of|and|is)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|y|es)\b",
}


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID: stopword-hit argmax with fixed priority en>de>fr>es,
    CJK-codepoint override for zh, 'und' when no lexicon hits."""
    d = table(spark, sf_dir, "documents")
    hits = {k: F.regexp_count("text", F.lit(v)) for k, v in _LEX.items()}
    zh = F.regexp_count("text", F.lit(r"[一-鿿]"))
    best = F.greatest(*hits.values())
    pred = (
        F.when(zh > 0, "zh")
        .when(best == 0, "und")
        .when(hits["en"] == best, "en")
        .when(hits["de"] == best, "de")
        .when(hits["fr"] == best, "fr")
        .otherwise("es")
    )
    return d.select("doc_id", "lang", pred.alias("lang_pred"))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length + punctuation-ratio + stopword-ratio blend,
    banded into keep/review/drop (integer-derived → exact parity)."""
    d = table(spark, sf_dir, "documents")
    toks = F.size(F.filter(F.split("text", r"\s+"), lambda t: t != ""))
    punct = F.regexp_count("text", F.lit(r"[.,;:!?]"))
    stop = F.regexp_count("text", F.lit(_LEX["en"]))
    quality = F.round(
        F.least(toks / F.lit(100.0), F.lit(1.0)) * 0.5
        + (1.0 - punct / F.col("n_chars")) * 0.3
        + F.least(stop * F.lit(10.0) / toks, F.lit(1.0)) * 0.2,
        4,
    )
    band = (
        F.when(quality >= 0.7, "keep").when(quality >= 0.4, "review").otherwise("drop")
    )
    return d.select(
        "doc_id",
        toks.alias("n_tokens"),
        quality.alias("quality"),
        band.alias("band"),
    )


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per source: whitespace tokens + BPE-ish regex tokens
    (letter runs / digit runs / single symbols)."""
    d = table(spark, sf_dir, "documents")
    ws = F.size(F.filter(F.split("text", r"\s+"), lambda t: t != ""))
    bpe = F.regexp_count("text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    return (
        d.select("source", ws.alias("ws"), bpe.alias("bpe"))
        .groupBy("source")
        .agg(
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
            F.round(F.avg("ws"), 2).alias("avg_ws"),
        )
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: sequential polynomial rolling hash over word
    hashes mod 2^31-1 (left fold — identical order in both engines), plus a
    duplicate-group count over the fingerprint."""
    d = table(spark, sf_dir, "documents", spread=True)
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * 31 + hex32(w)) % F.lit(2147483647),
    )
    out = d.select("doc_id", fp.alias("fp"))
    w = Window.partitionBy("fp")
    return out.withColumn("dup_cnt", F.count("*").over(w))


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 content hash → canonical = min doc_id per hash,
    keep flag on the canonical row (hash-groupBy dedup at scale)."""
    d = table(spark, sf_dir, "documents")
    h = F.md5(F.encode(F.lower(F.col("text")), "UTF-8"))
    w = Window.partitionBy("h")
    return (
        d.select("doc_id", h.alias("h"))
        .withColumn("canonical", F.min("doc_id").over(w))
        .withColumn("keep", F.col("doc_id") == F.col("canonical"))
        .select("doc_id", "h", "canonical", "keep")
    )




def q_salted_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe word count: two-phase salted aggregation (§4.3a) over the
    exploded token stream — hot tokens ('the', 'a') spread across salts in
    the partial phase. Result provably equals the plain GROUP BY (the
    DuckDB oracle)."""
    from ..plans.skew import salted_count_sum

    d = table(spark, sf_dir, "documents", spread=True)
    words = d.select(
        F.explode(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("word")
    )
    return salted_count_sum(words, ["word"], n_salts=16)




def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-curation funnel: documents surviving each filter
    stage (language → quality band → exact-dedup canonical) — the summary
    table a training-data pipeline publishes per ingest batch."""
    lang = q_lang_id(spark, sf_dir).select("doc_id", "lang_pred")
    qual = q_quality_score(spark, sf_dir).select("doc_id", "band")
    ded = q_dedup_exact(spark, sf_dir).select("doc_id", "keep")
    j = lang.join(qual, "doc_id").join(ded, "doc_id")
    return j.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("lang_pred") != "und", 1).otherwise(0)).alias("lang_ok"),
        F.sum(
            F.when((F.col("lang_pred") != "und") & (F.col("band") != "drop"), 1)
            .otherwise(0)
        ).alias("quality_ok"),
        F.sum(
            F.when(
                (F.col("lang_pred") != "und")
                & (F.col("band") != "drop")
                & F.col("keep"),
                1,
            ).otherwise(0)
        ).alias("kept"),
    )


# per-language keep rates (percent) for corpus rebalancing: downsample the
# dominant language, keep more of the tail — the standard pre-training mix
# adjustment. Deterministic hash sampling so every engine/run agrees.
SAMPLE_RATES = {"en": 30, "de": 60, "es": 60, "fr": 60, "zh": 60}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: keep a doc iff
    ``hash(doc_id) % 100 < rate(lang)``. The rate table is a broadcast
    dim join (at 100 TB the strata table is always dictionary-sized);
    hash sampling needs no shuffle, no RNG state, and is reproducible
    across engines and retries — unlike ``df.sample``."""
    d = table(spark, sf_dir, "documents")
    rates = spark.createDataFrame(
        sorted(SAMPLE_RATES.items()), "lang string, rate int"
    )
    keep = (
        hex32(F.concat(F.lit("smp|"), F.col("doc_id").cast("string"))) % 100
        < F.col("rate")
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(keep)
        .select("doc_id", "lang", "source")
    )


def q_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    5-word n-gram with the held-out eval set (docs with doc_id % 20 == 0
    stand in for the benchmark suite). The eval n-gram set is
    dictionary-sized relative to the corpus, so the overlap check is a
    BROADCAST semi-join on the n-gram — the contaminated-doc scan stays
    one map-side pass at 100 TB (GPT-3-style 13-gram decontamination,
    shortened to 5-grams for the synthetic corpus)."""
    d = table(spark, sf_dir, "documents", spread=True)
    grams = d.select("doc_id", F.explode(ngrams(F.col("text"), 5)).alias("g")).distinct()
    eval_g = grams.filter(F.col("doc_id") % 20 == 0).select("g").distinct()
    train_g = grams.filter(F.col("doc_id") % 20 != 0)
    hits = (
        train_g.join(F.broadcast(eval_g), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        d.filter(F.col("doc_id") % 20 != 0)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_contaminated"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (Gopher-style quality rules):
    fraction of word 2-grams that are repeats of an earlier 2-gram, and
    the frequency share of the most common token. Both are pure
    per-document array expressions — map-side only, no shuffle, fully
    codegen'd; high-repetition docs are boilerplate/spam candidates."""
    d = table(spark, sf_dir, "documents", spread=True)
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    grams = ngrams(F.col("text"), 2)
    n_g = F.size(grams)
    dup_frac = F.when(
        n_g > 0,
        F.round((n_g - F.size(F.array_distinct(grams))) / n_g, 4),
    ).otherwise(F.lit(0.0))
    # max token frequency / token count: sort tokens, count the longest
    # equal-run via aggregate over positions (expression-only argmax)
    st = F.array_sort(toks)
    n_t = F.size(st)
    runs = F.aggregate(
        F.sequence(F.lit(2), n_t),
        F.struct(F.lit(1).alias("run"), F.lit(1).alias("best")),
        lambda acc, i: F.struct(
            F.when(F.element_at(st, i) == F.element_at(st, i - 1), acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(
                    F.element_at(st, i) == F.element_at(st, i - 1), acc["run"] + 1
                ).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    # guard: Spark's sequence(2, n) DESCENDS for n < 2 (DuckDB's
    # generate_series is empty) — take the fold only when it's well-formed
    best = F.when(n_t >= 2, runs["best"]).otherwise(n_t)
    top_frac = F.when(n_t > 0, F.round(best / n_t, 4)).otherwise(F.lit(0.0))
    return d.select(
        "doc_id",
        n_g.cast("long").alias("n_2grams"),
        dup_frac.alias("dup_2gram_frac"),
        top_frac.alias("top_token_frac"),
    )


# PII patterns (no \b anchors: Java-regex and RE2 word boundaries are
# only guaranteed to agree on ASCII, and these patterns self-delimit)
_PII = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"555-\d{3}-\d{4}",
    "ip": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
}


def _pii_enriched() -> Column:
    """The synthetic corpus is a clean word bag, so augment each document
    in-query with PII derived from doc_id (same stand-in precedent as
    q_decontam's doc_id % 20 eval set): both engines build the identical
    enriched string, so the scrub path is genuinely exercised."""
    did = F.col("doc_id")
    s = lambda c: c.cast("string")
    email = F.when(
        did % 3 == 0,
        F.concat(F.lit(" u"), s(did), F.lit("@ex"), s(did % 7), F.lit(".org")),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 4 == 0,
        F.concat(
            F.lit(" 555-"), s(did % 900 + 100), F.lit("-"),
            F.lpad(s((did * 37) % 10000), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 5 == 0,
        F.concat(
            F.lit(" 10."), s(did % 256), F.lit("."), s((did * 3) % 256),
            F.lit("."), s((did * 7) % 256),
        ),
    ).otherwise(F.lit(""))
    return F.concat(F.col("text"), email, phone, ip)


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: count + scrub emails / phone numbers / IPv4
    addresses (email → phone → ip, fixed order) into typed placeholders.
    Pure map-side regexp expressions — codegen'd, no shuffle, embarrassingly
    parallel at 100 TB; the scrubbed text is md5'd so the oracle verifies
    the full replacement output without shipping long strings."""
    d = table(spark, sf_dir, "documents", spread=True)
    t = _pii_enriched()
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _PII["email"], "[EMAIL]"),
            _PII["phone"], "[PHONE]",
        ),
        _PII["ip"], "[IP]",
    )
    return d.select(
        "doc_id",
        F.regexp_count(t, F.lit(_PII["email"])).alias("n_emails"),
        F.regexp_count(t, F.lit(_PII["phone"])).alias("n_phones"),
        F.regexp_count(t, F.lit(_PII["ip"])).alias("n_ips"),
        F.md5(F.encode(scrubbed, "UTF-8")).alias("scrub_md5"),
    )


def q_url_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL extraction + per-host rollup (the crawl-frequency table a
    curation pipeline uses for domain-level filtering): regexp-extract all
    URLs, parse the host, aggregate url/document counts per host. One
    map-side extract pass + one modest-cardinality groupBy (hosts, not
    URLs, are the key — AQE handles residual hot-host skew; for truly
    pathological hosts the salted two-phase agg in plans/skew.py applies
    unchanged)."""
    d = table(spark, sf_dir, "documents", spread=True)
    did = F.col("doc_id")
    s = lambda c: c.cast("string")
    u1 = F.when(
        did % 2 == 0,
        F.concat(F.lit(" http://h"), s(did % 5), F.lit(".example.com/p/"), s(did)),
    ).otherwise(F.lit(""))
    u2 = F.when(
        did % 6 == 0,
        F.concat(F.lit(" https://cdn"), s(did % 3), F.lit(".example.net/a?b="), s(did)),
    ).otherwise(F.lit(""))
    t = F.concat(F.col("text"), u1, u2)
    urls = d.select(
        "doc_id",
        F.explode(F.regexp_extract_all(t, F.lit(r"https?://[^\s]+"), 0)).alias("url"),
    )
    return (
        urls.select(
            "doc_id",
            F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("host"),
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


QUERIES = {
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    "token_stats": q_token_stats,
    "fingerprint": q_fingerprint,
    "dedup_exact": q_dedup_exact,
    "salted_wordcount": q_salted_wordcount,
    "curation_funnel": q_curation_funnel,
    "stratified_sample": q_stratified_sample,
    "decontam": q_decontam,
    "repetition": q_repetition,
    "pii_scrub": q_pii_scrub,
    "url_hosts": q_url_hosts,
}

_TOKS = "list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"

ORACLES = {
    "lang_id": f"""
        SELECT doc_id, lang,
               CASE WHEN zh > 0 THEN 'zh'
                    WHEN best = 0 THEN 'und'
                    WHEN h_en = best THEN 'en'
                    WHEN h_de = best THEN 'de'
                    WHEN h_fr = best THEN 'fr'
                    ELSE 'es' END AS lang_pred
        FROM (
            SELECT doc_id, lang,
                   len(regexp_extract_all(text, '{_LEX["en"]}')) AS h_en,
                   len(regexp_extract_all(text, '{_LEX["de"]}')) AS h_de,
                   len(regexp_extract_all(text, '{_LEX["fr"]}')) AS h_fr,
                   len(regexp_extract_all(text, '{_LEX["es"]}')) AS h_es,
                   len(regexp_extract_all(text, '[\\x{{4e00}}-\\x{{9fff}}]')) AS zh,
                   greatest(len(regexp_extract_all(text, '{_LEX["en"]}')),
                            len(regexp_extract_all(text, '{_LEX["de"]}')),
                            len(regexp_extract_all(text, '{_LEX["fr"]}')),
                            len(regexp_extract_all(text, '{_LEX["es"]}'))) AS best
            FROM documents
        )
    """,
    "quality_score": f"""
        SELECT doc_id, n_tokens, quality,
               CASE WHEN quality >= 0.7 THEN 'keep'
                    WHEN quality >= 0.4 THEN 'review'
                    ELSE 'drop' END AS band
        FROM (
            SELECT doc_id, toks AS n_tokens,
                   round(least(toks / 100.0, 1.0) * 0.5
                         + (1.0 - punct / n_chars) * 0.3
                         + least(stop * 10.0 / toks, 1.0) * 0.2, 4) AS quality
            FROM (
                SELECT doc_id, n_chars,
                       len({_TOKS}) AS toks,
                       len(regexp_extract_all(text, '[.,;:!?]')) AS punct,
                       len(regexp_extract_all(text, '{_LEX["en"]}')) AS stop
                FROM documents
            )
        )
    """,
    "token_stats": f"""
        SELECT source, sum(ws)::BIGINT AS ws_tokens, sum(bpe)::BIGINT AS bpe_tokens,
               round(avg(ws), 2) AS avg_ws
        FROM (
            SELECT source, len({_TOKS}) AS ws,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe
            FROM documents
        ) GROUP BY source
    """,
    "fingerprint": f"""
        SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS dup_cnt
        FROM (
            SELECT doc_id,
                   list_reduce(
                       list_prepend(0::BIGINT,
                           list_transform({_TOKS}, w -> {DUCK_HEX32.format(x="w")})),
                       (acc, h) -> (acc * 31 + h) % 2147483647) AS fp
            FROM documents
        )
    """,
    "dedup_exact": """
        SELECT doc_id, h, canonical, doc_id = canonical AS keep
        FROM (
            SELECT doc_id, md5(lower(text)) AS h,
                   min(doc_id) OVER (PARTITION BY md5(lower(text))) AS canonical
            FROM documents
        )
    """,
    "curation_funnel": f"""
        WITH lang AS ({{LANG_SQL}}),
        qual AS ({{QUAL_SQL}}),
        ded AS ({{DED_SQL}})
        SELECT count(*)::BIGINT AS total,
               sum(CASE WHEN l.lang_pred <> 'und' THEN 1 ELSE 0 END)::BIGINT AS lang_ok,
               sum(CASE WHEN l.lang_pred <> 'und' AND q.band <> 'drop' THEN 1 ELSE 0 END)::BIGINT AS quality_ok,
               sum(CASE WHEN l.lang_pred <> 'und' AND q.band <> 'drop' AND d.keep THEN 1 ELSE 0 END)::BIGINT AS kept
        FROM lang l JOIN qual q ON l.doc_id = q.doc_id
        JOIN ded d ON d.doc_id = l.doc_id
    """,
    "salted_wordcount": f"""
        SELECT word, count(*) AS n FROM (
            SELECT unnest({_TOKS}) AS word FROM documents
        ) GROUP BY word
    """,
    "stratified_sample": f"""
        WITH rates(lang, rate) AS (VALUES {", ".join(f"('{k}', {v})" for k, v in sorted(SAMPLE_RATES.items()))})
        SELECT d.doc_id, d.lang, d.source
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE {DUCK_HEX32.format(x="'smp|' || d.doc_id::VARCHAR")} % 100 < r.rate
    """,
    "decontam": f"""
        WITH g0 AS (
            SELECT doc_id, unnest(gs) AS g FROM (
                SELECT doc_id, {duck_ngrams(5)} AS gs FROM (
                    SELECT doc_id, {_TOKS} AS toks FROM documents
                )
            )
        ),
        g AS (SELECT DISTINCT doc_id, g FROM g0),
        ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 20 = 0),
        hits AS (
            SELECT g.doc_id, count(*) AS n
            FROM g JOIN ev ON g.g = ev.g
            WHERE g.doc_id % 20 <> 0 GROUP BY g.doc_id
        )
        SELECT d.doc_id, coalesce(h.n, 0)::BIGINT AS n_contaminated,
               coalesce(h.n, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
        WHERE d.doc_id % 20 <> 0
    """,
    # top_token_frac via plain unnest+group-by max count — same result as
    # the Spark side's sorted-run fold, different (simpler) formulation
    "repetition": f"""
        WITH base AS (
            SELECT doc_id, {_TOKS} AS toks,
                   {duck_ngrams(2, toks=_TOKS)} AS gs
            FROM documents
        ),
        tc AS (
            SELECT doc_id, max(c) AS best FROM (
                SELECT doc_id, tok, count(*) AS c
                FROM (SELECT doc_id, unnest(toks) AS tok FROM base)
                GROUP BY doc_id, tok
            ) GROUP BY doc_id
        )
        SELECT b.doc_id,
               len(b.gs)::BIGINT AS n_2grams,
               CASE WHEN len(b.gs) > 0
                    THEN round((len(b.gs) - len(list_distinct(b.gs))) / len(b.gs), 4)
                    ELSE 0.0 END AS dup_2gram_frac,
               CASE WHEN len(b.toks) > 0
                    THEN round(tc.best / len(b.toks), 4)
                    ELSE 0.0 END AS top_token_frac
        FROM base b LEFT JOIN tc ON tc.doc_id = b.doc_id
    """,
    "pii_scrub": f"""
        SELECT doc_id,
               len(regexp_extract_all(t, '{_PII["email"]}')) AS n_emails,
               len(regexp_extract_all(t, '{_PII["phone"]}')) AS n_phones,
               len(regexp_extract_all(t, '{_PII["ip"]}')) AS n_ips,
               md5(regexp_replace(
                       regexp_replace(
                           regexp_replace(t, '{_PII["email"]}', '[EMAIL]', 'g'),
                           '{_PII["phone"]}', '[PHONE]', 'g'),
                       '{_PII["ip"]}', '[IP]', 'g')) AS scrub_md5
        FROM (
            SELECT doc_id, text
                || CASE WHEN doc_id % 3 = 0
                        THEN ' u' || doc_id::VARCHAR || '@ex'
                             || (doc_id % 7)::VARCHAR || '.org'
                        ELSE '' END
                || CASE WHEN doc_id % 4 = 0
                        THEN ' 555-' || (doc_id % 900 + 100)::VARCHAR || '-'
                             || lpad(((doc_id * 37) % 10000)::VARCHAR, 4, '0')
                        ELSE '' END
                || CASE WHEN doc_id % 5 = 0
                        THEN ' 10.' || (doc_id % 256)::VARCHAR || '.'
                             || ((doc_id * 3) % 256)::VARCHAR || '.'
                             || ((doc_id * 7) % 256)::VARCHAR
                        ELSE '' END AS t
            FROM documents
        )
    """,
    "url_hosts": """
        SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
               count(*) AS n_urls,
               count(DISTINCT doc_id) AS n_docs
        FROM (
            SELECT doc_id, unnest(regexp_extract_all(t, 'https?://[^\\s]+')) AS url
            FROM (
                SELECT doc_id, text
                    || CASE WHEN doc_id % 2 = 0
                            THEN ' http://h' || (doc_id % 5)::VARCHAR
                                 || '.example.com/p/' || doc_id::VARCHAR
                            ELSE '' END
                    || CASE WHEN doc_id % 6 = 0
                            THEN ' https://cdn' || (doc_id % 3)::VARCHAR
                                 || '.example.net/a?b=' || doc_id::VARCHAR
                            ELSE '' END AS t
                FROM documents
            )
        ) GROUP BY host
    """,
}

ORACLES["curation_funnel"] = ORACLES["curation_funnel"].format(
    LANG_SQL=ORACLES["lang_id"],
    QUAL_SQL=ORACLES["quality_score"],
    DED_SQL=ORACLES["dedup_exact"],
)
