"""Combinatorial-optimization DP, batch 89: weighted interval
scheduling and 0/1 knapsack selection — exact optimizers for the two
budgeted-curation shapes (pick non-overlapping sessions; pick docs
under a token budget), joining the fold-DP family (dtw/lcs/viterbi).

Scale design (100 TB):
- Both DPs are GROUP-CONFINED (per user / per source) and run inside
  one codegen fold over the group's sorted item array — no UDF, no
  per-item shuffle; the only exchanges are the groupBy collects. The
  semedup/kendall confinement discipline: quadratic-ish work never
  crosses a shuffle, the group is the knob.
- ``weighted_intervals``: classic end-ordered DP — dp(i) =
  max(dp(i−1), wᵢ + dp(p(i))) with p(i) = #intervals ending ≤ startᵢ.
  The fold carries (ends_so_far, dp_prefix); p(i) is a linear probe of
  the bounded ends array (len(filter(ends, e ≤ start))) — O(n²) worst
  case INSIDE the group expression, exact int64 weights. Intervals are
  deterministic event-derived sessions (start = event second, duration
  (event_id%7+1) minutes, weight (event_id%13)+1).
- ``knapsack_select``: per source, the exact 0/1 knapsack optimum of
  doc quality value under capacity B=24 weight units (weight =
  n_chars div 200 + 1): the fold rewrites the full (B+1)-entry dp
  array per item via an indexed transform over 0..B — textbook
  max(dp[c], v + dp[c−w]). Emits the optimum value (+ group sizes),
  an exact integer.

Reference parity: no optimizer layer in the reference; these give the
curation side exact small-capacity optima to calibrate the greedy
selectors (max_coverage, mix_sample, token_budget) against.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

KNAP_CAP = 24  # knapsack capacity (weight units of ~200 chars)


def _intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    start = F.unix_timestamp("ts").cast("long")
    dur = ((F.col("event_id") % 7 + 1) * 60).cast("long")
    w = (F.col("event_id") % 13 + 1).cast("long")
    return e.select(
        "user_id",
        start.alias("s"),
        (start + dur).alias("en"),
        w.alias("w"),
    )


_INTERVALS_SQL = """
    SELECT user_id,
           floor(epoch(ts))::BIGINT AS s,
           floor(epoch(ts))::BIGINT + (event_id % 7 + 1) * 60 AS en,
           event_id % 13 + 1 AS w
    FROM events
"""


def q_weighted_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: max total weight of pairwise non-overlapping intervals
    (closed-open [s, en): touching endpoints DO combine)."""
    iv = _intervals(spark, sf_dir)
    per_user = iv.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("en", "s", "w"))
        ).alias("ivs"),
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
    )
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.expr("CAST(array() AS ARRAY<BIGINT>)").alias("ends"),
        F.array(zero).alias("dp"),
    )

    def step(acc, it):
        p = F.size(F.filter(acc["ends"], lambda e: e <= it["s"]))
        best = F.greatest(
            F.element_at(acc["dp"], -1),
            it["w"] + F.get(acc["dp"], p),
        )
        return F.struct(
            F.concat(acc["ends"], F.array(it["en"])).alias("ends"),
            F.concat(acc["dp"], F.array(best)).alias("dp"),
        )

    fin = F.aggregate(F.col("ivs"), init, step)
    return per_user.select(
        "user_id", "n_intervals",
        F.element_at(fin["dp"], -1).alias("best_weight"),
    )


_WI_SQL = f"""
WITH iv AS ({_INTERVALS_SQL}),
g AS (
    SELECT user_id,
           list_sort(list({{'en': en, 's': s, 'w': w}})) AS ivs,
           count(*)::BIGINT AS n_intervals
    FROM iv GROUP BY user_id
),
-- accumulator is a LIST OF [end, dp] PAIRS with a [-1, 0] sentinel
-- (dp(0)=0): the oracle engine's list_reduce corrupts struct-of-list
-- accumulators across steps (measured), flat list-of-lists fold fine.
-- The sentinel always passes the e<=s probe, so the filter count IS
-- the 1-based dp index of p(i).
dp AS (
    SELECT user_id, n_intervals,
           list_reduce(
               list_prepend(CAST([[-1, 0]] AS BIGINT[][]),
                            list_transform(ivs,
                                i -> [CAST([i.en, i.s, i.w] AS BIGINT[])])),
               (acc, it) -> list_append(acc,
                   [it[1][1],
                    greatest(acc[-1][2],
                             it[1][3] + acc[len(list_filter(acc,
                                 x -> x[1] <= it[1][2]))][2])])
           )[-1][2] AS best_weight
    FROM g
)
SELECT user_id, n_intervals, best_weight FROM dp
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    return d.select(
        "source",
        F.col("doc_id").cast("long").alias("doc_id"),
        (F.floor(F.col("n_chars") / 200) + 1).cast("long").alias("w"),
        (F.col("doc_id").cast("long") % 17 + 1).alias("v"),
    )


_DOCS_SQL = """
    SELECT source, CAST(doc_id AS BIGINT) AS doc_id,
           n_chars // 200 + 1 AS w,
           CAST(doc_id AS BIGINT) % 17 + 1 AS v
    FROM documents
"""


def q_knapsack_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: exact 0/1 knapsack optimum — max Σv of docs with
    Σw ≤ KNAP_CAP (items in doc_id order; value = doc_id%17+1)."""
    d = _docs(spark, sf_dir)
    per_src = d.groupBy("source").agg(
        F.sort_array(
            F.collect_list(F.struct("doc_id", "w", "v"))
        ).alias("items"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )
    zero = F.lit(0).cast("long")
    caps = F.sequence(F.lit(0), F.lit(KNAP_CAP))
    init = F.transform(caps, lambda _: zero)

    def step(dp, it):
        return F.transform(
            caps,
            lambda c: F.when(
                c >= it["w"],
                F.greatest(F.get(dp, c), it["v"] + F.get(dp, c - it["w"])),
            ).otherwise(F.get(dp, c)),
        )

    fin = F.aggregate(F.col("items"), init, step)
    return per_src.select(
        "source", "n_items",
        F.element_at(fin, -1).alias("best_value"),
    )


_KNAP_SQL = f"""
WITH d AS ({_DOCS_SQL}),
g AS (
    SELECT source,
           list_sort(list({{'doc_id': doc_id, 'w': w, 'v': v}})) AS items,
           count(*)::BIGINT AS n_items
    FROM d GROUP BY source
),
dp AS (
    SELECT source, n_items,
           list_reduce(
               list_prepend(
                   list_transform(generate_series(0, {KNAP_CAP}),
                                  c -> CAST(0 AS BIGINT)),
                   list_transform(items, i -> [i.w, i.v])),
               (acc, it) -> list_transform(
                   generate_series(0, {KNAP_CAP}),
                   c -> CASE WHEN c >= it[1]
                             THEN greatest(acc[c + 1],
                                           it[2] + acc[c - it[1] + 1])
                             ELSE acc[c + 1] END)
           )[-1] AS best_value
    FROM g
)
SELECT source, n_items, best_value FROM dp
"""


QUERIES = {
    "weighted_intervals": q_weighted_intervals,
    "knapsack_select": q_knapsack_select,
}

ORACLES = {
    "weighted_intervals": _WI_SQL,
    "knapsack_select": _KNAP_SQL,
}
