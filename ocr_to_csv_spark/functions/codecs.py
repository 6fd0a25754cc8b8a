"""Array-codec + multidim-binning batch 22: delta-encoded posting
lists with an in-plan round-trip proof, run-length encoding of event
sequences, and a 2-D histogram — the compression/binning primitives an
index- or feature-building pipeline runs at scale.

Scale design (100 TB):
- ``postings_delta`` gap-encodes each token's sorted posting list
  map-side with one ``transform`` over the collected array (gaps[i] =
  p[i] − p[i−1]); the round-trip (cumulative re-sum == original,
  proven per row IN THE PLAN via a fold and emitted as roundtrip_ok)
  costs one more map-side pass — no extra shuffle. Gap lists are what
  real indexes varbyte-compress; the sum-of-gaps == max-doc-id
  invariant also rides out as an integer.
- ``rle_events`` run-length-encodes each user's event-type sequence:
  change-points via one lag window per user (boundaries only cross
  the shuffle as 0/1 flags), runs aggregated by (user, run_id) — the
  gaps-and-islands shape on VALUE changes rather than key gaps.
- ``histogram2d`` bins events on (hour-of-day × fixed value band) in
  ONE map-side groupBy — fixed band edges, so no quantile pass and no
  second shuffle; the classic heatmap feed.

Reference parity: none in the reference; extends postings/tfidf
(textops.py) and the binning family (histogram, equidepth_hist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import DUCK_TOKENS, table, tokens

N_POSTINGS = 20
VAL_BAND = 5_000  # cents per band (values ~0-200 dollars → ~4 bands)


def q_postings_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-encoded postings for the N_POSTINGS highest-df tokens:
    (token, df, first_doc, gaps-as-CSV, sum_gaps, roundtrip_ok) with
    sum(first + gaps) == last posting proven in-plan."""
    d = table(spark, sf_dir, "documents", spread=True)
    tf = d.select(
        F.explode(tokens(F.col("text"))).alias("tok"), "doc_id"
    ).distinct()
    agg = tf.groupBy("tok").agg(
        F.count("*").alias("df"),
        F.sort_array(F.collect_set("doc_id")).alias("plist"),
    )
    # gaps[i] = plist[i+1] - plist[i]  (element_at is 1-based)
    gaps = F.expr(
        "transform(slice(plist, 2, size(plist) - 1),"
        " (x, i) -> x - element_at(plist, i + 1))"
    )
    enc = agg.select(
        "tok",
        "df",
        F.element_at("plist", 1).alias("first_doc"),
        F.element_at("plist", -1).alias("last_doc"),
        gaps.alias("gaps"),
    )
    decoded_last = F.col("first_doc") + F.expr(
        "aggregate(gaps, 0L, (acc, g) -> acc + g)"
    )
    return (
        enc.select(
            "tok",
            "df",
            "first_doc",
            F.array_join(
                F.transform("gaps", lambda g: g.cast("string")), ","
            ).alias("gaps_csv"),
            F.expr("aggregate(gaps, 0L, (acc, g) -> acc + g)").alias(
                "sum_gaps"
            ),
            (decoded_last == F.col("last_doc"))
            .cast("int")
            .alias("roundtrip_ok"),
        )
        .orderBy(F.desc("df"), F.asc("tok"))
        .limit(N_POSTINGS)
    )


# DuckDB: same tokenization as textops' DUCK_TOKENS; gaps via indexed
# list comprehension over generate_series (1-based slicing lessons).
def _postings_delta_sql() -> str:
    return f"""
        WITH tf AS (
            SELECT DISTINCT tok, doc_id
            FROM (
                SELECT unnest({DUCK_TOKENS.format(x='text')}) AS tok, doc_id
                FROM documents
            )
        ),
        agg AS (
            SELECT tok, count(*)::BIGINT AS df,
                   list_sort(list(DISTINCT doc_id)) AS plist
            FROM tf GROUP BY tok
        ),
        enc AS (
            SELECT tok, df,
                   plist[1]::BIGINT AS first_doc,
                   plist[len(plist)]::BIGINT AS last_doc,
                   [plist[i::BIGINT + 1] - plist[i::BIGINT]
                    FOR i IN generate_series(1, len(plist) - 1)] AS gaps
            FROM agg
        )
        SELECT tok, df, first_doc,
               coalesce(list_aggregate(list_transform(gaps, g -> g::VARCHAR),
                                       'string_agg', ','), '') AS gaps_csv,
               coalesce(list_sum(gaps), 0)::BIGINT AS sum_gaps,
               (first_doc + coalesce(list_sum(gaps), 0)
                = last_doc)::INT AS roundtrip_ok
        FROM enc
        ORDER BY df DESC, tok ASC
        LIMIT {N_POSTINGS}
    """


def q_rle_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding of each user's time-ordered event-type
    sequence: per user the number of runs, the longest run length, and
    total events (Σ run_len) — change-points from one lag window."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    sec = F.unix_timestamp("ts").cast("long")
    base = e.select(
        "user_id", "event_type", sec.alias("sec"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("sec"), F.asc("event_id"))
    flagged = base.withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        ).otherwise(0),
    )
    runs = (
        flagged.withColumn(
            "run_id", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("user_id", "run_id")
        .agg(F.count("*").alias("run_len"))
    )
    return runs.groupBy("user_id").agg(
        F.count("*").alias("n_runs"),
        F.max("run_len").alias("max_run"),
        F.sum("run_len").alias("n_events"),
    )


_RLE_SQL = """
    WITH base AS (
        SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS sec,
               event_id
        FROM events WHERE user_id IS NOT NULL
    ),
    flagged AS (
        SELECT user_id,
               CASE WHEN lag(event_type) OVER w IS NULL
                         OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS chg,
               sec, event_id
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY sec ASC, event_id ASC)
    ),
    runs AS (
        SELECT user_id,
               sum(chg) OVER (PARTITION BY user_id
                              ORDER BY sec ASC, event_id ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS run_id
        FROM flagged
    ),
    lens AS (
        SELECT user_id, run_id, count(*)::BIGINT AS run_len
        FROM runs GROUP BY user_id, run_id
    )
    SELECT user_id, count(*)::BIGINT AS n_runs,
           max(run_len)::BIGINT AS max_run,
           sum(run_len)::BIGINT AS n_events
    FROM lens GROUP BY user_id
"""


def q_histogram2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram: events binned on (hour of day × fixed value
    band of VAL_BAND cents) with count and exact cents sum per cell."""
    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        e.select(
            F.hour("ts").cast("long").alias("h"),
            cents.alias("cents"),
        )
        .withColumn("band", F.expr(f"cents div {VAL_BAND}"))
        .groupBy("h", "band")
        .agg(
            F.count("*").alias("n"),
            F.sum("cents").alias("sum_cents"),
        )
    )


_HIST2D_SQL = f"""
    SELECT hour(ts)::BIGINT AS h,
           (round(value * 100)::BIGINT // {VAL_BAND}) AS band,
           count(*)::BIGINT AS n,
           sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents
    FROM events
    GROUP BY 1, 2
"""


QUERIES = {
    "postings_delta": q_postings_delta,
    "rle_events": q_rle_events,
    "histogram2d": q_histogram2d,
}

ORACLES = {
    "postings_delta": _postings_delta_sql(),
    "rle_events": _RLE_SQL,
    "histogram2d": _HIST2D_SQL,
}
