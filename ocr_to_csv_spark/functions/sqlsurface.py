"""Advanced SQL surface, batch 18: exact distributed median,
navigation window functions (first/last/nth_value over full frames),
regexp_extract_all, and array set algebra — the remaining expression
classes a user of a full engine expects.

Scale design (100 TB):
- ``median_exact`` finds the true median with ONE rank window per
  group + a count join — no global sort, no collect; the two middle
  values are summed so the result (2·median) stays integer. For
  groups too hot for a single-partition rank, the production fallback
  is the existing ``quantile_sketch``; this query is the exact path.
- ``nav_window`` evaluates first/last/nth over an UNBOUNDED-UNBOUNDED
  frame; Spark computes them in one pass per partition, and the
  per-customer dedup ships only one row per key out of the window.
- ``regex_words`` is a pure map-side expression (regexp_extract_all →
  size/distinct); pattern kept to RE2-compatible syntax (no
  backreferences) so JVM regex and the DuckDB oracle agree.
- ``array_surface`` exercises array_intersect/union/except with SET
  semantics; both engines dedup but order differently, so sizes (not
  lists) cross the engine boundary. All map-side.

Reference parity: none of these exist in the reference; they round
out the expression surface of relational.py (§2.5/§2.7 families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import table

S_WORD = r"\bs[a-z]{3,}\b"


def q_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-event-type median of value-cents, returned as
    (n, med2) with med2 = 2×median kept integer: med2 = sum of the one
    (doubled) or two middle values by rank."""
    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    base = e.select("event_type", "event_id", cents.alias("cents"))
    w = Window.partitionBy("event_type").orderBy(
        F.asc("cents"), F.asc("event_id")
    )
    cnt = Window.partitionBy("event_type")
    ranked = base.select(
        "event_type",
        "cents",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count("*").over(cnt).alias("n"),
    )
    p1 = (F.col("n") + 1) / 2
    p2 = F.col("n") / 2 + 1
    mid = ranked.filter(
        (F.col("rn") == F.floor(p1)) | (F.col("rn") == F.floor(p2))
    )
    return mid.groupBy("event_type").agg(
        F.max("n").alias("n"),
        # odd n → one middle row matched by both predicates → double it
        F.when(F.count("*") == 1, 2 * F.sum("cents"))
        .otherwise(F.sum("cents"))
        .cast("long")
        .alias("med2"),
    )


_MEDIAN_SQL = """
    WITH ranked AS (
        SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cents ASC, event_id ASC)::BIGINT
                   AS rn,
               count(*) OVER (PARTITION BY event_type)::BIGINT AS n
        FROM (
            SELECT event_type, event_id,
                   round(value * 100)::BIGINT AS cents
            FROM events
        )
    )
    SELECT event_type,
           max(n)::BIGINT AS n,
           (CASE WHEN count(*) = 1 THEN 2 * sum(cents)
                 ELSE sum(cents) END)::BIGINT AS med2
    FROM ranked
    WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
    GROUP BY event_type
"""


def q_nav_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation functions over the full partition frame: per
    customer, first / last / 2nd order value (cents) in date order."""
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = o.select(
        "o_custkey", "o_orderkey", "o_orderdate", cents.alias("cents")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        base.select(
            "o_custkey",
            F.first("cents").over(w).alias("first_c"),
            F.last("cents").over(w).alias("last_c"),
            F.nth_value("cents", 2).over(w).alias("second_c"),
            F.count("*").over(w).alias("n_orders"),
        )
        .distinct()
    )


_NAV_SQL = """
    SELECT DISTINCT o_custkey,
           first_value(cents) OVER w AS first_c,
           last_value(cents) OVER w AS last_c,
           nth_value(cents, 2) OVER w AS second_c,
           count(*) OVER w AS n_orders
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               round(o_totalprice * 100)::BIGINT AS cents
        FROM orders
    )
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING)
"""


def q_regex_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all surface: per doc, how many s-words (4+
    letters starting with 's') and how many distinct ones."""
    d = table(spark, sf_dir, "documents")
    matches = F.regexp_extract_all(F.col("text"), F.lit(S_WORD), 0)
    return d.select(
        "doc_id",
        F.size(matches).alias("n_matches"),
        F.size(F.array_distinct(matches)).alias("n_distinct"),
    )


_REGEX_SQL = f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{S_WORD}'))::INT AS n_matches,
           len(list_distinct(regexp_extract_all(text, '{S_WORD}')))::INT
               AS n_distinct
    FROM documents
"""


def q_array_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra: split each doc's token list in half and
    report |first ∩ second|, |first ∪ second|, |first ∖ second| (set
    semantics — sizes only, element order is engine-specific)."""
    d = table(spark, sf_dir, "documents")
    split = d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    first = F.expr("slice(toks, 1, size(toks) div 2)")
    second = F.expr(
        "slice(toks, size(toks) div 2 + 1, size(toks) - size(toks) div 2)"
    )
    return split.select(
        "doc_id",
        F.size(F.array_intersect(first, second)).alias("n_common"),
        F.size(F.array_union(first, second)).alias("n_union"),
        F.size(F.array_except(first, second)).alias("n_only_first"),
    )


_ARRAY_SQL = """
    SELECT doc_id,
           len(list_intersect(first, second))::INT AS n_common,
           len(list_distinct(list_concat(first, second)))::INT AS n_union,
           len(list_filter(list_distinct(first),
                           x -> NOT list_contains(second, x)))::INT
               AS n_only_first
    FROM (
        SELECT doc_id,
               toks[1 : len(toks) // 2] AS first,
               toks[len(toks) // 2 + 1 : len(toks)] AS second
        FROM (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        )
    )
"""


QUERIES = {
    "median_exact": q_median_exact,
    "nav_window": q_nav_window,
    "regex_words": q_regex_words,
    "array_surface": q_array_surface,
}

ORACLES = {
    "median_exact": _MEDIAN_SQL,
    "nav_window": _NAV_SQL,
    "regex_words": _REGEX_SQL,
    "array_surface": _ARRAY_SQL,
}
