"""Warehouse / training-analytics operators, batch 6: cohort retention,
event-sequence Markov transitions, one-pass correlation matrix, data-
mixture shares, and per-key equi-depth histograms.

Scale design (100 TB):
- ``retention_cohorts`` is the classic product-analytics cohort grid.
  Two shuffles, both keyed and bounded: a user-keyed min-aggregate
  (partial map-side) to place each user in a cohort week, then one
  user-keyed join back to the event stream and a final aggregate whose
  group cardinality is weeks x weeks — tiny regardless of corpus size.
  Nothing user-sized ever reaches the driver.
- ``markov_transitions`` (user-journey Markov chain): ``lead()`` over
  (user_id, ts) is a per-key in-partition sort after one hash shuffle —
  the sessionize/pack_sequences discipline, never a global sort. The
  transition-count aggregate is bounded by |event_type|^2.
- ``corr_matrix`` is the one-pass Pearson correlation pattern every
  feature-selection / data-audit job uses: all six moment sums
  (n, sum x, sum x^2, sum xy, ...) come out of a SINGLE map-side
  partial aggregate — one row crosses the shuffle, the matrix math is
  driver-free arithmetic on that row. Inputs are integer-quantized
  (quantity as-is, price in whole dollars, discount in cents) so the
  moment sums are exact int64 and the final doubles are a fixed
  parenthesization of exact integers: bit-identical across engines
  (IEEE multiply/subtract/sqrt/divide are all correctly rounded).
- ``data_mixture`` is the pretraining data-mixture report (tokens per
  (lang, source) and each cell's share of the corpus / of its
  language): one corpus-wide aggregate with partial map-side combine;
  the share windows run over the AGGREGATED table whose cardinality is
  |lang| x |source| — a few dozen rows at any corpus size, so the
  empty-frame window is deliberate, not a skew hazard.
- ``equidepth_hist`` builds per-key equi-depth (equal-count) histograms
  — the CBO statistics shape — with ``ntile`` partitioned by the key,
  so each histogram is an independent in-partition sort. For ONE global
  histogram over 100 TB use the mergeable ``quantile_sketch`` instead;
  this op is the exact path for per-dimension stats.

All outputs are integer counts or fixed-parenthesization IEEE doubles
computed from exact integers; DuckDB oracles run identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import DUCK_TOKENS, table, tokens

EPOCH = "2024-01-01"  # cohort-week epoch (events corpus starts here)
N_TILES = 8


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by the week of their
    first event; for each (cohort_week, weeks-since-cohort) cell, the
    count of distinct users active in that week."""
    e = table(spark, sf_dir, "events")
    week = (F.datediff(F.to_date("ts"), F.lit(EPOCH)) / 7).cast("int")
    acts = e.select("user_id", week.alias("week"))
    cohorts = acts.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        acts.join(cohorts, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_k"))
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix: per user, order events by
    (ts, event_id) and count (current, next) event-type pairs;
    p = n / total-transitions-from-current (ratio of exact ints)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("cur_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .where(F.col("next_type").isNotNull())
        .groupBy("cur_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
    wt = Window.partitionBy("cur_type")
    return pairs.select(
        "cur_type",
        "next_type",
        "n",
        (
            F.col("n").cast("double") / F.sum("n").over(wt).cast("double")
        ).alias("p"),
    )


# the fixed-parenthesization Pearson numerator/denominator, shared
# verbatim between the Spark expression and the DuckDB oracle so both
# engines execute the identical IEEE operation chain
def _corr_expr(x: str, y: str) -> str:
    n = "CAST(n AS DOUBLE)"

    def d(c: str) -> str:
        return f"CAST({c} AS DOUBLE)"

    num = f"(({n} * {d('s_' + x + y)}) - ({d('s_' + x)} * {d('s_' + y)}))"
    vx = f"(({n} * {d('s_' + x + x)}) - ({d('s_' + x)} * {d('s_' + x)}))"
    vy = f"(({n} * {d('s_' + y + y)}) - ({d('s_' + y)} * {d('s_' + y)}))"
    return f"({num} / (sqrt({vx}) * sqrt({vy})))"


def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass Pearson correlation matrix over lineitem's
    (quantity, price-in-dollars, discount-in-cents): six exact int64
    moment sums from a single aggregate, then fixed-IEEE matrix math."""
    li = table(spark, sf_dir, "lineitem").select(
        F.round("l_quantity").cast("long").alias("q"),
        F.floor("l_extendedprice").cast("long").alias("p"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
    )
    sums = li.agg(
        F.count("*").alias("n"),
        F.sum("q").alias("s_q"),
        F.sum("p").alias("s_p"),
        F.sum("d").alias("s_d"),
        F.sum(F.col("q") * F.col("q")).alias("s_qq"),
        F.sum(F.col("p") * F.col("p")).alias("s_pp"),
        F.sum(F.col("d") * F.col("d")).alias("s_dd"),
        F.sum(F.col("q") * F.col("p")).alias("s_qp"),
        F.sum(F.col("q") * F.col("d")).alias("s_qd"),
        F.sum(F.col("p") * F.col("d")).alias("s_pd"),
    )
    return sums.select(
        "n",
        F.expr(_corr_expr("q", "p")).alias("corr_qty_price"),
        F.expr(_corr_expr("q", "d")).alias("corr_qty_disc"),
        F.expr(_corr_expr("p", "d")).alias("corr_price_disc"),
    )


def q_data_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining data-mixture report: per (lang, source) doc and
    token counts plus each cell's token share of the corpus and of its
    language. The share windows run over the aggregated |lang|x|source|
    table (dozens of rows), not the corpus."""
    d = table(spark, sf_dir, "documents")
    cells = (
        d.select("lang", "source", F.size(tokens(F.col("text"))).cast("long").alias("nt"))
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("nt").alias("n_tokens"))
    )
    w_all = Window.partitionBy()
    w_lang = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        (
            F.col("n_tokens").cast("double")
            / F.sum("n_tokens").over(w_all).cast("double")
        ).alias("share_corpus"),
        (
            F.col("n_tokens").cast("double")
            / F.sum("n_tokens").over(w_lang).cast("double")
        ).alias("share_lang"),
    )


def q_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority equi-depth histogram of order totals: ntile(8) over
    (o_totalprice, o_orderkey) within each o_orderpriority, then per
    tile count + value bounds. Per-key in-partition sorts only."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_orderpriority", "o_totalprice", F.ntile(N_TILES).over(w).alias("tile"))
        .groupBy("o_orderpriority", "tile")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


QUERIES = {
    "retention_cohorts": q_retention_cohorts,
    "markov_transitions": q_markov_transitions,
    "corr_matrix": q_corr_matrix,
    "data_mixture": q_data_mixture,
    "equidepth_hist": q_equidepth_hist,
}

_TOKS = DUCK_TOKENS.format(x="text")

ORACLES = {}

ORACLES["retention_cohorts"] = f"""
    WITH acts AS (
        SELECT user_id,
               (date_diff('day', DATE '{EPOCH}', ts::DATE) // 7)::INT AS week
        FROM events
    ),
    cohorts AS (
        SELECT user_id, min(week) AS cohort_week FROM acts GROUP BY user_id
    )
    SELECT c.cohort_week AS cohort_week,
           (a.week - c.cohort_week)::INT AS week_k,
           count(DISTINCT a.user_id)::BIGINT AS n_users
    FROM acts a JOIN cohorts c USING (user_id)
    GROUP BY 1, 2
"""

ORACLES["markov_transitions"] = """
    WITH pairs AS (
        SELECT event_type AS cur_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    counts AS (
        SELECT cur_type, next_type, count(*)::BIGINT AS n
        FROM pairs WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT cur_type, next_type, n,
           (CAST(n AS DOUBLE)
            / CAST(sum(n) OVER (PARTITION BY cur_type) AS DOUBLE)) AS p
    FROM counts
"""

ORACLES["corr_matrix"] = f"""
    WITH q AS (
        SELECT CAST(round(l_quantity) AS BIGINT) AS q,
               CAST(floor(l_extendedprice) AS BIGINT) AS p,
               CAST(round(l_discount * 100) AS BIGINT) AS d
        FROM lineitem
    ),
    sums AS (
        SELECT count(*)::BIGINT AS n,
               sum(q)::BIGINT AS s_q, sum(p)::BIGINT AS s_p,
               sum(d)::BIGINT AS s_d,
               sum(q * q)::BIGINT AS s_qq, sum(p * p)::BIGINT AS s_pp,
               sum(d * d)::BIGINT AS s_dd,
               sum(q * p)::BIGINT AS s_qp, sum(q * d)::BIGINT AS s_qd,
               sum(p * d)::BIGINT AS s_pd
        FROM q
    )
    SELECT n,
           {_corr_expr('q', 'p')} AS corr_qty_price,
           {_corr_expr('q', 'd')} AS corr_qty_disc,
           {_corr_expr('p', 'd')} AS corr_price_disc
    FROM sums
"""

ORACLES["data_mixture"] = f"""
    WITH cells AS (
        SELECT lang, source,
               count(*)::BIGINT AS n_docs,
               sum(len({_TOKS}))::BIGINT AS n_tokens
        FROM documents
        GROUP BY 1, 2
    )
    SELECT lang, source, n_docs, n_tokens,
           (CAST(n_tokens AS DOUBLE)
            / CAST(sum(n_tokens) OVER () AS DOUBLE)) AS share_corpus,
           (CAST(n_tokens AS DOUBLE)
            / CAST(sum(n_tokens) OVER (PARTITION BY lang) AS DOUBLE))
               AS share_lang
    FROM cells
"""

ORACLES["equidepth_hist"] = f"""
    WITH tiled AS (
        SELECT o_orderpriority, o_totalprice,
               ntile({N_TILES}) OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey
               ) AS tile
        FROM orders
    )
    SELECT o_orderpriority, tile,
           count(*)::BIGINT AS n,
           min(o_totalprice) AS lo,
           max(o_totalprice) AS hi
    FROM tiled
    GROUP BY 1, 2
"""
