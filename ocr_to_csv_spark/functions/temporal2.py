"""Sequence-DP operators, batch 85: dynamic time warping distance and
longest-common-subsequence similarity between per-type daily series —
the elastic-alignment measures the point-wise family (autocorr, ks,
holt, ewma) cannot express.

Scale design (100 TB):
- Both are full O(n·m) dynamic programs, but run as PURE CODEGEN
  nested array folds (outer ``F.aggregate`` over series A carrying the
  previous DP row, inner fold over series B building the current row —
  exactly DuckDB's ``list_reduce`` nested the same way), so there is
  NO udf and NO per-cell shuffle: the quadratic work is confined
  inside one row's expression evaluation, the same
  bounded-group-confinement discipline as kendall_tau/semdedup. Series
  are CALENDAR-BOUNDED day-grain aggregates (≤ horizon days, here ≤60)
  — the day rollup is the only event-scale shuffle; the pair table is
  |event types|² (theta_intersect precedent). At 10^12 events the plan
  is: one keyed HashAggregate to day grain, one to type grain, one
  tiny self-join.
- ``dtw_dist``: dp[i][j] = |aᵢ−bⱼ| + min(dp[i-1][j], dp[i][j-1],
  dp[i-1][j-1]); all-integer costs (daily counts), INF = 10^12
  sentinel (path costs ≤ 10^8, so sentinel cells can never win);
  result is the exact integer DTW distance — bit-equal cross-engine
  by construction, no floats anywhere.
- ``lcs_series``: longest common subsequence of the two types'
  BUCKETED count sequences (cnt div 5 — a bounded alphabet so
  equality is meaningful); dp[i][j] = dp[i-1][j-1]+1 on match else
  max(dp[i-1][j], dp[i][j-1]); emitted with both lengths so the
  normalized similarity stays an exact rational.

Reference parity: no time-series layer in the reference; these are the
curation-side sequence comparators (user-trajectory/traffic-shape
near-duplicate detection) complementing the text-side edit distances
(lev_verify, jaro_winkler).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

INF = 10**12  # DP sentinel — real path costs stay ≤ ~10^8
LCS_BUCKET = 5  # count-bucket width for the LCS alphabet


def _series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: the day-ordered daily-count series (arrays)."""
    e = table(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts").cast("long") / 86400).cast("long")
    daily = e.groupBy(F.col("event_type").alias("typ"), day.alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    xs = F.transform(
        F.sort_array(F.collect_list(F.struct("day", "cnt"))),
        lambda s: s["cnt"],
    )
    return daily.groupBy("typ").agg(
        xs.alias("xs"), F.count(F.lit(1)).cast("long").alias("n_days")
    )


_SERIES_SQL = """
    SELECT event_type AS typ,
           list(cnt ORDER BY day) AS xs,
           count(*)::BIGINT AS n_days
    FROM (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               count(*)::BIGINT AS cnt
        FROM events GROUP BY 1, 2
    ) GROUP BY 1
"""


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _series(spark, sf_dir)
    a = s.select(
        F.col("typ").alias("type_a"), F.col("xs").alias("xa"),
        F.col("n_days").alias("n_a"),
    )
    b = s.select(
        F.col("typ").alias("type_b"), F.col("xs").alias("xb"),
        F.col("n_days").alias("n_b"),
    )
    return a.join(b, F.col("type_a") < F.col("type_b"))


_PAIRS_SQL = f"""
WITH s AS ({_SERIES_SQL})
SELECT a.typ AS type_a, a.xs AS xa, a.n_days AS n_a,
       b.typ AS type_b, b.xs AS xb, b.n_days AS n_b
FROM s a JOIN s b ON a.typ < b.typ
"""


def _dtw_col(xa: Column, xb: Column) -> Column:
    """dp over (xa, xb) as the nested fold (module docstring)."""
    inf = F.lit(INF).cast("long")
    prev0 = F.concat(
        F.array(F.lit(0).cast("long")),
        F.transform(xb, lambda _: inf),
    )

    def outer(prev, av):
        def inner(row, bv):
            j = F.size(row)  # row holds dp[i][0..j-1]
            best = F.least(
                F.get(prev, j - 1),  # dp[i-1][j-1]
                F.get(prev, j),  # dp[i-1][j]
                F.element_at(row, -1),  # dp[i][j-1]
            )
            return F.concat(row, F.array(F.abs(av - bv) + best))

        return F.aggregate(xb, F.array(inf), inner)

    return F.element_at(F.aggregate(xa, prev0, outer), -1)


def q_dtw_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer DTW distance between every pair of event types'
    daily-count series."""
    p = _pairs(spark, sf_dir)
    return p.select(
        "type_a", "type_b", "n_a", "n_b",
        _dtw_col(F.col("xa"), F.col("xb")).alias("dtw"),
    )


_DTW_SQL = f"""
WITH p AS ({_PAIRS_SQL})
SELECT type_a, type_b, n_a, n_b,
       (list_reduce(
            list_prepend(
                list_prepend(CAST(0 AS BIGINT),
                             list_transform(xb, x -> CAST({INF} AS BIGINT))),
                list_transform(xa, x -> [x])),
            (prev, av) -> list_reduce(
                list_prepend(CAST([{INF}] AS BIGINT[]),
                             list_transform(xb, x -> [x])),
                (row, bv) -> list_append(row,
                    abs(av[1] - bv[1])
                    + least(prev[len(row)], prev[len(row) + 1], row[-1]))))
       )[-1] AS dtw
FROM p
"""


def _lcs_col(xa: Column, xb: Column) -> Column:
    zero = F.lit(0).cast("long")
    bucket = lambda v: F.floor(v / LCS_BUCKET).cast("long")  # noqa: E731
    prev0 = F.concat(
        F.array(zero), F.transform(xb, lambda _: zero)
    )

    def outer(prev, av):
        def inner(row, bv):
            j = F.size(row)
            hit = bucket(av) == bucket(bv)
            val = F.when(hit, F.get(prev, j - 1) + 1).otherwise(
                F.greatest(F.get(prev, j), F.element_at(row, -1))
            )
            return F.concat(row, F.array(val))

        return F.aggregate(xb, F.array(zero), inner)

    return F.element_at(F.aggregate(xa, prev0, outer), -1)


def q_lcs_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LCS length between every pair of event types' bucketed
    daily-count sequences (+ both lengths: similarity stays rational)."""
    p = _pairs(spark, sf_dir)
    return p.select(
        "type_a", "type_b", "n_a", "n_b",
        _lcs_col(F.col("xa"), F.col("xb")).alias("lcs"),
    )


_LCS_SQL = f"""
WITH p AS ({_PAIRS_SQL})
SELECT type_a, type_b, n_a, n_b,
       (list_reduce(
            list_prepend(
                list_prepend(CAST(0 AS BIGINT),
                             list_transform(xb, x -> CAST(0 AS BIGINT))),
                list_transform(xa, x -> [x])),
            (prev, av) -> list_reduce(
                list_prepend(CAST([0] AS BIGINT[]),
                             list_transform(xb, x -> [x])),
                (row, bv) -> list_append(row,
                    CASE WHEN av[1] // {LCS_BUCKET} = bv[1] // {LCS_BUCKET}
                         THEN prev[len(row)] + 1
                         ELSE greatest(prev[len(row) + 1], row[-1]) END)))
       )[-1] AS lcs
FROM p
"""


QUERIES = {
    "dtw_dist": q_dtw_dist,
    "lcs_series": q_lcs_series,
}

ORACLES = {
    "dtw_dist": _DTW_SQL,
    "lcs_series": _LCS_SQL,
}
