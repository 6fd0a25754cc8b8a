"""Multi-pattern scanning, batch 78: Aho–Corasick blocklist scan and
segment-aligned longest-prefix URL-path classification.

Scale design (100 TB):
- ``multi_pattern_scan`` (Aho & Corasick 1975): the blocklist /
  keyword-filter primitive — K literal patterns found in ONE pass per
  document, O(len(text) + matches), instead of K regex passes. The
  automaton (trie + BFS failure links + inherited exit sets) is built
  once in Python from the fixed pattern list — automaton size is
  pattern-set-sized, data-independent — and ships inside the
  ``mapInPandas`` closure (Arrow-batched, never per-row UDF), so the
  scan is entirely map-side: zero joins, zero shuffle before the
  (doc, pattern)-keyed output. The DuckDB oracle counts each pattern
  with the replace-length trick (non-overlapping count — equal to the
  AC all-occurrences count for NON-PERIODIC patterns, which the test
  asserts all patterns are). Patterns include nested ones ("value"
  inside "hash value") to pin that AC reports both.
- ``url_prefix_match``: longest-prefix rule matching on URL paths —
  the crawl allow/deny-list lookup. Same discipline as ``lpm_join``
  (netops.py): constant fan-out to one candidate per PREFIX DEPTH
  (each path emits its ≤3 segment-aligned prefixes map-side), one
  equi-join against the broadcast rule table, winner = one keyed
  max-depth argmax — never a starts_with theta-join. Paths are
  synthesized deterministically from doc_id (both engines reproduce
  exactly); the oracle does the naive starts_with scan so the gate
  proves the prefix-explode plan matches the semantics.

Reference parity: generalizes the reference's single-regex date scan
(main.py's re.search loop) to the many-pattern / many-rule scanning a
web-scale curation pipeline runs per document.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

PATTERNS: list[str] = [
    "hash value",
    "value",
    "fast merge",
    "query key",
    "sort table window",
    "spark",
    "zebra quantum",  # planted never-occurs pattern
]


def _build_ac(patterns: list[str]):
    """Aho–Corasick automaton: goto trie, failure links, and per-node
    exit list (pattern ids ending at the node, inherited along the
    failure chain)."""
    goto: list[dict[str, int]] = [{}]
    exits: list[list[int]] = [[]]
    for pid, pat in enumerate(patterns):
        s = 0
        for ch in pat:
            if ch not in goto[s]:
                goto.append({})
                exits.append([])
                goto[s][ch] = len(goto) - 1
            s = goto[s][ch]
        exits[s].append(pid)
    # BFS failure links
    from collections import deque

    fail = [0] * len(goto)
    dq = deque(goto[0].values())
    while dq:
        s = dq.popleft()
        for ch, t in goto[s].items():
            dq.append(t)
            f = fail[s]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[t] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != t else 0
            exits[t] = exits[t] + exits[fail[t]]
    return goto, fail, exits


def _ac_scan(text: str, goto, fail, exits) -> dict[int, int]:
    """Count ALL occurrences (overlapping included) of every pattern."""
    hits: dict[int, int] = {}
    s = 0
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        for pid in exits[s]:
            hits[pid] = hits.get(pid, 0) + 1
    return hits


def q_multi_pattern_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass Aho–Corasick scan of every document against PATTERNS;
    rows (doc_id, pattern, hits) for patterns that occur."""
    auto = _build_ac(PATTERNS)
    pats = PATTERNS

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        goto, fail, exits = auto
        for pdf in batches:
            out_doc, out_pat, out_hits = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for pid, n in sorted(
                    _ac_scan(text or "", goto, fail, exits).items()
                ):
                    out_doc.append(doc_id)
                    out_pat.append(pats[pid])
                    out_hits.append(n)
            yield pd.DataFrame(
                {"doc_id": out_doc, "pattern": out_pat, "hits": out_hits}
            )

    d = table(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    return d.mapInPandas(scan, "doc_id long, pattern string, hits long")


def _scan_sql() -> str:
    vals = ", ".join(f"('{p}')" for p in PATTERNS)
    return f"""
        WITH pats(p) AS (VALUES {vals})
        SELECT doc_id::BIGINT AS doc_id, p AS pattern,
               ((length(text) - length(replace(text, p, '')))
                   // length(p))::BIGINT AS hits
        FROM documents, pats
        WHERE length(text) - length(replace(text, p, '')) > 0
    """


# rule table: (rule_id, segment-aligned path prefix); fixed and tiny
RULES: list[tuple[int, str]] = [
    (1, "/a"),
    (2, "/a/x"),
    (3, "/a/x/1"),
    (4, "/b/y"),
    (5, "/c/z"),  # never matches: segment 2 is always x or y
]
MAX_DEPTH = 3


def _paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 3-segment paths /s1/s2/s3 from doc_id."""
    d = table(spark, sf_dir, "documents", spread=True)
    did = F.col("doc_id").cast("long")
    s1 = F.element_at(F.array(F.lit("a"), F.lit("b"), F.lit("c")), (did % 3 + 1).cast("int"))
    s2 = F.element_at(F.array(F.lit("x"), F.lit("y")), (did % 2 + 1).cast("int"))
    s3 = (did % 4).cast("string")
    return d.select(
        did.alias("doc_id"),
        F.concat(F.lit("/"), s1, F.lit("/"), s2, F.lit("/"), s3).alias("path"),
        F.concat(F.lit("/"), s1).alias("pfx1"),
        F.concat(F.lit("/"), s1, F.lit("/"), s2).alias("pfx2"),
        F.concat(F.lit("/"), s1, F.lit("/"), s2, F.lit("/"), s3).alias("pfx3"),
    )


_PATHS_SQL = """
    SELECT doc_id::BIGINT AS doc_id,
           '/' || s1 || '/' || s2 || '/' || s3 AS path
    FROM (
        SELECT doc_id,
               ['a','b','c'][(doc_id % 3 + 1)::INT] AS s1,
               ['x','y'][(doc_id % 2 + 1)::INT] AS s2,
               (doc_id % 4)::VARCHAR AS s3
        FROM documents
    )
"""


def q_url_prefix_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest segment-aligned prefix rule per path: explode each path
    to its ≤3 prefixes map-side, equi-join the broadcast rule table,
    keep the deepest match."""
    p = _paths(spark, sf_dir)
    cand = p.select(
        "doc_id", "path",
        F.explode(F.array("pfx1", "pfx2", "pfx3")).alias("prefix"),
    )
    rules = spark.createDataFrame(RULES, "rule_id long, prefix string")
    hits = cand.join(F.broadcast(rules), "prefix")
    pick = F.struct(
        (-F.length("prefix")).alias("nl"), F.col("rule_id").alias("r")
    )
    return (
        hits.groupBy("doc_id", "path")
        .agg(F.min(pick).alias("m"))
        .select("doc_id", "path", F.col("m.r").alias("rule_id"))
    )


def _prefix_sql() -> str:
    vals = ", ".join(f"({rid}, '{p}')" for rid, p in RULES)
    return f"""
        WITH paths AS ({_PATHS_SQL}),
        rules(rule_id, prefix) AS (VALUES {vals}),
        hits AS (
            SELECT p.doc_id, p.path, r.rule_id, length(r.prefix) AS plen
            FROM paths p JOIN rules r
              ON p.path = r.prefix
                 OR starts_with(p.path, r.prefix || '/')
        )
        SELECT doc_id, path,
               min_by(rule_id, (1000 - plen) * 1000 + rule_id)::BIGINT
                   AS rule_id
        FROM hits GROUP BY doc_id, path
    """


QUERIES = {
    "multi_pattern_scan": q_multi_pattern_scan,
    "url_prefix_match": q_url_prefix_match,
}

ORACLES = {
    "multi_pattern_scan": _scan_sql(),
    "url_prefix_match": _prefix_sql(),
}
