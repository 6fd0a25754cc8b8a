"""Crawl-policy operators, batch 100: robots.txt rule evaluation with
Google's longest-match-wins semantics, and URL canonicalization — the
two normalizers that run on every fetched URL before a 10^12-doc crawl
dedups or refetches anything.

Scale design (100 TB):
- ``robots_match``: the per-host ruleset is TINY (robots files are KB)
  — a broadcast equi-join on host, so each URL meets only its host's
  rules (never the global rule table). Wildcard patterns are compiled
  ONCE in Python to anchored regexes (`*` → `.*`, trailing `$` kept)
  and shipped as string literals to BOTH engines, so there is no
  in-engine translation to disagree about; RE2 (DuckDB) and Java
  regex agree on this `^literal.*$` subset. Precedence is the
  documented Google rule: longest RAW pattern wins, allow beats
  disallow on ties — one keyed max-struct argmax per URL. No rules /
  no match ⇒ allow (the robots default), via left join + coalesce.
- ``url_canonical``: pure map-side expression chain — one regex parse
  of the URL into (scheme, authority, path, query, fragment), then
  lowercase scheme+host, strip default :80 port, drop the fragment,
  and split→filter(`utm_*` tracking params)→sort→rejoin the query.
  Zero joins, zero shuffles; the op that makes ``url_dedup``'s exact
  hash actually mean "same resource".

Reference parity: no crawl layer in the reference; completes the
url family (url_hosts, url_dedup, url_prefix_match, lpm_join,
redirect_resolve, crawl_budget).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

# (rule_id, host, allow, raw_pattern) — a robots.txt corpus. Wildcard
# `*` matches any run; trailing `$` anchors the end; otherwise prefix.
ROBOTS_RULES: list[tuple[int, str, int, str]] = [
    (1, "h0.example.com", 0, "/p/"),
    (2, "h0.example.com", 1, "/p/1*"),       # longer ⇒ overrides 1
    (3, "h1.example.com", 0, "/a/*?*"),      # no queries under /a/
    (4, "h2.example.com", 0, "*9$"),         # nothing ending in 9
    (5, "h3.example.com", 0, "/a/"),
    (6, "h3.example.com", 1, "/a/*7$"),      # ...except ids ending in 7
    # h4.example.com: no rules ⇒ default allow
]


def _compile(raw: str) -> str:
    """robots pattern → anchored regex (both-engine-safe subset)."""
    anchored = raw.endswith("$")
    body = raw[:-1] if anchored else raw
    rx = "^" + ".*".join(re.escape(part) for part in body.split("*"))
    return rx + ("$" if anchored else "")


def _urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-doc URL (the url_hosts synthesis convention):
    even docs get /p/<id>, odd docs /a/<id>?q=<id%7>."""
    d = table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    s = lambda c: c.cast("string")
    host = F.concat(F.lit("h"), s(did % 5), F.lit(".example.com"))
    target = F.when(
        did % 2 == 0, F.concat(F.lit("/p/"), s(did))
    ).otherwise(F.concat(F.lit("/a/"), s(did), F.lit("?q="), s(did % 7)))
    return d.select("doc_id", host.alias("host"), target.alias("target"))


_URLS_SQL = """
    SELECT doc_id,
           'h' || (doc_id % 5)::VARCHAR || '.example.com' AS host,
           CASE WHEN doc_id % 2 = 0
                THEN '/p/' || doc_id::VARCHAR
                ELSE '/a/' || doc_id::VARCHAR || '?q='
                     || (doc_id % 7)::VARCHAR
           END AS target
    FROM documents
"""


def q_robots_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-URL robots decision under longest-match-wins (module doc).
    Emits (doc_id, host, target, rule_id, allowed)."""
    urls = _urls(spark, sf_dir)
    rules = spark.createDataFrame(
        [
            (rid, host, allow, len(raw), _compile(raw))
            for rid, host, allow, raw in ROBOTS_RULES
        ],
        "rule_id long, host string, allow long, pat_len long, rx string",
    )
    hits = (
        urls.join(F.broadcast(rules), "host")
        .filter(F.expr("target RLIKE rx"))
        .groupBy("doc_id")
        .agg(F.max(F.struct("pat_len", "allow", "rule_id")).alias("m"))
        .select(
            "doc_id",
            F.col("m.rule_id").alias("rule_id"),
            F.col("m.allow").alias("allowed"),
        )
    )
    return (
        urls.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "host",
            "target",
            F.coalesce("rule_id", F.lit(-1)).cast("long").alias("rule_id"),
            F.coalesce("allowed", F.lit(1)).cast("long").alias("allowed"),
        )
        .orderBy("doc_id")
    )


def _rules_sql() -> str:
    rows = ", ".join(
        f"({rid}, '{host}', {allow}, {len(raw)}, '{_compile(raw)}')"
        for rid, host, allow, raw in ROBOTS_RULES
    )
    return (
        "SELECT * FROM (VALUES " + rows + ") "
        "AS t(rule_id, host, allow, pat_len, rx)"
    )


_ROBOTS_SQL = f"""
    WITH urls AS ({_URLS_SQL}),
    rules AS ({_rules_sql()}),
    hits AS (
        SELECT doc_id,
               max(struct_pack(pat_len := pat_len, allow := allow,
                               rule_id := rule_id)) AS m
        FROM urls JOIN rules USING (host)
        WHERE regexp_matches(target, rx)
        GROUP BY doc_id
    )
    SELECT u.doc_id, u.host, u.target,
           COALESCE(m.rule_id, -1)::BIGINT AS rule_id,
           COALESCE(m.allow, 1)::BIGINT AS allowed
    FROM urls u LEFT JOIN hits USING (doc_id)
    ORDER BY doc_id
"""


def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize a deliberately-messy synthesized URL: case-folded
    scheme/host, default port stripped, fragment dropped, query params
    minus utm_* sorted (module doc). Emits (doc_id, url, canon)."""
    d = table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    s = lambda c: c.cast("string")
    scheme = F.when(did % 3 == 0, F.lit("HTTP")).otherwise(F.lit("http"))
    host = F.when(
        did % 4 == 0,
        F.concat(F.lit("H"), s(did % 5), F.lit(".EXAMPLE.COM")),
    ).otherwise(F.concat(F.lit("h"), s(did % 5), F.lit(".example.com")))
    port = F.when(did % 6 == 0, F.lit(":80")).otherwise(F.lit(""))
    q1 = F.concat(F.lit("q="), s(did % 7))
    q2 = F.when(did % 3 == 1, F.lit("&utm_source=feed")).otherwise(F.lit(""))
    q3 = F.when(did % 2 == 1, F.concat(F.lit("&b="), s(did % 11))).otherwise(
        F.lit("")
    )
    frag = F.when(did % 5 == 1, F.lit("#top")).otherwise(F.lit(""))
    url = F.concat(
        scheme, F.lit("://"), host, port, F.lit("/p/"), s(did),
        F.lit("?"), q1, q2, q3, frag,
    )
    parsed = d.select("doc_id", url.alias("url")).select(
        "doc_id",
        "url",
        F.regexp_extract("url", r"^([A-Za-z]+)://", 1).alias("sch"),
        F.regexp_extract("url", r"^[A-Za-z]+://([^/]+)", 1).alias("auth"),
        F.regexp_extract("url", r"^[A-Za-z]+://[^/]+(/[^?#]*)", 1).alias(
            "path"
        ),
        F.regexp_extract("url", r"\?([^#]*)", 1).alias("q"),
    )
    params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.col("q"), "&"),
                lambda p: (p != "") & ~p.startswith("utm_"),
            )
        ),
        "&",
    )
    canon = F.concat(
        F.lower("sch"),
        F.lit("://"),
        F.regexp_replace(F.lower("auth"), ":80$", ""),
        F.col("path"),
        F.when(params != "", F.concat(F.lit("?"), params)).otherwise(
            F.lit("")
        ),
    )
    return parsed.select("doc_id", "url", canon.alias("canon")).orderBy(
        "doc_id"
    )


_CANON_SQL = """
    WITH raw AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 3 = 0 THEN 'HTTP' ELSE 'http' END)
               || '://'
               || (CASE WHEN doc_id % 4 = 0
                        THEN 'H' || (doc_id % 5)::VARCHAR || '.EXAMPLE.COM'
                        ELSE 'h' || (doc_id % 5)::VARCHAR || '.example.com'
                   END)
               || (CASE WHEN doc_id % 6 = 0 THEN ':80' ELSE '' END)
               || '/p/' || doc_id::VARCHAR
               || '?q=' || (doc_id % 7)::VARCHAR
               || (CASE WHEN doc_id % 3 = 1 THEN '&utm_source=feed'
                        ELSE '' END)
               || (CASE WHEN doc_id % 2 = 1
                        THEN '&b=' || (doc_id % 11)::VARCHAR ELSE '' END)
               || (CASE WHEN doc_id % 5 = 1 THEN '#top' ELSE '' END)
               AS url
        FROM documents
    ),
    parsed AS (
        SELECT doc_id, url,
               regexp_extract(url, '^([A-Za-z]+)://', 1) AS sch,
               regexp_extract(url, '^[A-Za-z]+://([^/]+)', 1) AS auth,
               regexp_extract(url, '^[A-Za-z]+://[^/]+(/[^?#]*)', 1) AS path,
               regexp_extract(url, '\\?([^#]*)', 1) AS q
        FROM raw
    ),
    canon AS (
        SELECT doc_id, url,
               array_to_string(list_sort(list_filter(
                   string_split(q, '&'),
                   p -> p <> '' AND NOT starts_with(p, 'utm_')
               )), '&') AS params,
               lower(sch) AS lsch,
               regexp_replace(lower(auth), ':80$', '') AS lauth,
               path
        FROM parsed
    )
    SELECT doc_id, url,
           lsch || '://' || lauth || path
           || (CASE WHEN params <> '' THEN '?' || params ELSE '' END)
               AS canon
    FROM canon
    ORDER BY doc_id
"""


QUERIES = {
    "robots_match": q_robots_match,
    "url_canonical": q_url_canonical,
}

ORACLES = {
    "robots_match": _ROBOTS_SQL,
    "url_canonical": _CANON_SQL,
}
