"""Statistical surface, batch 15: time-RANGE window frames, exact OLS
regression, deterministic mode, ordered string aggregation, and the
Gini concentration coefficient — the remaining classical-stats shapes
an analytics engine must cover beyond the reference's needs.

Scale design (100 TB):
- ``range_window`` is a RANGE frame (value-based, not row-count-based)
  over per-user event time: Spark's WindowExec streams the frame within
  each partition with O(window-span) state, so cost is one shuffle on
  ``user_id`` regardless of total volume; frames never cross users.
- ``ols_fit`` reduces the regression to five exact integer sums
  (n, Σx, Σy, Σxy, Σx²) — pure map-side partial aggregation, one
  shuffle of K=|event_type| rows; slope/intercept are returned as exact
  BIGINT rationals so no float crosses the engine boundary.
- ``mode_per_group`` aggregates to the (type, k) count table first
  (cardinality ≤ types × distinct-k, data-independent small), then
  takes top-1 per type with a deterministic tie-break — the window
  runs on the *aggregate*, never the raw events.
- ``string_agg_ordered`` collects a BOUNDED set (event types ≤ 8) per
  user; collect_set + array_sort is order-independent, so partial
  aggregation stays map-side combinable.
- ``gini`` needs a per-group rank over amounts — the one honest sort
  here; it ships as a single shuffle sorted by (type, cents, id) and
  the rank-weighted sums stream. All outputs are exact integers
  (rank-weighted sum formula), division left to the reader.

Reference parity: no stats layer in the reference (rad10/OCR-to-CSV);
extends the windowed/aggregate family of ``relational.py`` (moving_sum
rows-frame → range frame here; stats_agg moments → regression here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import table

RANGE_S = 600  # preceding seconds included in the range frame


def q_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running sum of value-cents over the trailing 10 minutes
    (RANGE frame on epoch seconds — peers at the same second aggregate
    together, unlike a rows frame)."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    sec = F.unix_timestamp("ts").cast("long")  # floors; oracle uses floor(epoch)
    cents = F.round(F.col("value") * 100).cast("long")
    base = e.select(
        "event_id", "user_id", sec.alias("sec"), cents.alias("cents")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-RANGE_S, Window.currentRow)
    )
    return base.select(
        "event_id",
        "user_id",
        "sec",
        F.sum("cents").over(w).alias("trail_cents"),
        F.count("*").over(w).alias("trail_n"),
    )


_RANGE_WINDOW_SQL = f"""
    SELECT event_id, user_id, sec,
           (sum(cents) OVER w)::BIGINT AS trail_cents,
           count(*) OVER w AS trail_n
    FROM (
        SELECT event_id, user_id,
               floor(epoch(ts))::BIGINT AS sec,
               round(value * 100)::BIGINT AS cents
        FROM events WHERE user_id IS NOT NULL
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN {RANGE_S} PRECEDING AND CURRENT ROW)
"""


def q_ols_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type least-squares fit of value-cents (y) on hour of
    day (x), returned as exact integer rationals:
    slope = num/den with num = n·Σxy − Σx·Σy, den = n·Σx² − (Σx)²;
    intercept = i_num/i_den with i_num = Σy·den − num·Σx, i_den = n·den.
    Five integer sums — fully map-side combinable, no float anywhere."""
    e = table(spark, sf_dir, "events")
    x = F.hour("ts").cast("long")
    y = F.round(F.col("value") * 100).cast("long")
    agg = (
        e.select(F.col("event_type"), x.alias("x"), y.alias("y"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return agg.select(
        "event_type",
        "n",
        num.alias("slope_num"),
        den.alias("slope_den"),
        (F.col("sy") * den - num * F.col("sx")).alias("icept_num"),
        (F.col("n") * den).alias("icept_den"),
    )


_OLS_FIT_SQL = """
    WITH s AS (
        SELECT event_type,
               count(*)::BIGINT AS n,
               sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
               sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx
        FROM (
            SELECT event_type,
                   hour(ts)::BIGINT AS x,
                   round(value * 100)::BIGINT AS y
            FROM events
        ) GROUP BY event_type
    )
    SELECT event_type, n,
           (n * sxy - sx * sy) AS slope_num,
           (n * sxx - sx * sx) AS slope_den,
           (sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx) AS icept_num,
           (n * (n * sxx - sx * sx)) AS icept_den
    FROM s
"""


def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode of the JSON prop ``k`` per event type, with a
    deterministic tie-break (highest count, then smallest k). The
    window ranks the (type, k) COUNT TABLE, not the raw events."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    counts = (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type", "k")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("cnt"), F.asc("k")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("k").alias("mode_k"), "cnt")
    )


_MODE_SQL = """
    SELECT event_type, k AS mode_k, cnt
    FROM (
        SELECT event_type, k, cnt,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cnt DESC, k ASC) AS rn
        FROM (
            SELECT event_type,
                   json_extract(props, '$.k')::BIGINT AS k,
                   count(*)::BIGINT AS cnt
            FROM events
            WHERE json_extract(props, '$.k') IS NOT NULL
            GROUP BY event_type, json_extract(props, '$.k')
        )
    ) WHERE rn = 1
"""


def q_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: per user, the sorted comma-joined
    set of event types seen (bounded set ⇒ map-side combinable)."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    return (
        e.groupBy("user_id")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("event_type")), ","
            ).alias("types_csv"),
            F.count_distinct("event_type").alias("n_types"),
        )
    )


_STRING_AGG_SQL = """
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type)
               AS types_csv,
           count(DISTINCT event_type)::BIGINT AS n_types
    FROM events WHERE user_id IS NOT NULL
    GROUP BY user_id
"""


def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of spend per event type, as exact integers:
    with amounts x_1 ≤ … ≤ x_n (ties broken by event_id) and
    W = Σ i·x_i, Gini = (2W)/(n·Σx) − (n+1)/n. Returns (n, sum_c, W)
    so the division never leaves integer land."""
    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    base = e.select(
        "event_type", "event_id", cents.alias("cents")
    ).filter(F.col("cents") > 0)
    w = Window.partitionBy("event_type").orderBy(
        F.asc("cents"), F.asc("event_id")
    )
    ranked = base.withColumn("i", F.row_number().over(w).cast("long"))
    return ranked.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("sum_c"),
        F.sum(F.col("i") * F.col("cents")).alias("wsum"),
    )


_GINI_SQL = """
    SELECT event_type,
           count(*)::BIGINT AS n,
           sum(cents)::BIGINT AS sum_c,
           sum(i * cents)::BIGINT AS wsum
    FROM (
        SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cents ASC, event_id ASC)::BIGINT
                   AS i
        FROM (
            SELECT event_type, event_id,
                   round(value * 100)::BIGINT AS cents
            FROM events
        ) WHERE cents > 0
    ) GROUP BY event_type
"""


def q_spearman_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation inputs between doc length (n_chars)
    and token count: ranks are row_number with doc_id tie-break (a
    deterministic permutation — the documented ties variant), returning
    (n, sum_d2) so ρ = 1 − 6·Σd²/(n(n²−1)) needs no float here. The
    two global rank sorts are range-partitioned ORDER BYs; at 10^12
    docs you'd rank via sortWithinPartitions + partition-offset
    (zipWithIndex idiom) rather than a single window partition."""
    d = table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "n_chars",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_toks"),
    )
    w1 = Window.orderBy(F.asc("n_chars"), F.asc("doc_id"))
    w2 = Window.orderBy(F.asc("n_toks"), F.asc("doc_id"))
    ranked = base.select(
        (F.row_number().over(w1) - F.row_number().over(w2))
        .cast("long")
        .alias("dd")
    )
    return ranked.agg(
        F.count("*").alias("n"),
        F.sum(F.col("dd") * F.col("dd")).alias("sum_d2"),
    )


_SPEARMAN_SQL = """
    WITH base AS (
        SELECT doc_id, n_chars,
               len(string_split(text, ' '))::BIGINT AS n_toks
        FROM documents
    ),
    ranked AS (
        SELECT (row_number() OVER (ORDER BY n_chars ASC, doc_id ASC)
                - row_number() OVER (ORDER BY n_toks ASC, doc_id ASC))
                   ::BIGINT AS dd
        FROM base
    )
    SELECT count(*)::BIGINT AS n, sum(dd * dd)::BIGINT AS sum_d2
    FROM ranked
"""


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median of doc length with token-count weights: the
    smallest n_chars whose cumulative weight reaches half the total
    (2·cumw ≥ totw), via one cumulative-sum window over the sorted
    (n_chars, doc_id) sequence + a 1-row total broadcast."""
    d = table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "n_chars",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("w"),
    )
    tot = base.agg(F.sum("w").alias("totw"))
    cum = Window.orderBy(F.asc("n_chars"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walked = base.crossJoin(F.broadcast(tot)).select(
        "n_chars",
        "doc_id",
        "totw",
        F.sum("w").over(cum).alias("cumw"),
    )
    pick = Window.orderBy(F.asc("n_chars"), F.asc("doc_id"))
    return (
        walked.filter(2 * F.col("cumw") >= F.col("totw"))
        .withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            F.col("n_chars").alias("wmedian_chars"),
            "cumw",
            "totw",
        )
    )


_WMEDIAN_SQL = """
    WITH base AS (
        SELECT doc_id, n_chars,
               len(string_split(text, ' '))::BIGINT AS w
        FROM documents
    ),
    walked AS (
        SELECT n_chars, doc_id,
               (sum(w) OVER (ORDER BY n_chars ASC, doc_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW))::BIGINT AS cumw,
               (SELECT sum(w) FROM base)::BIGINT AS totw
        FROM base
    )
    SELECT n_chars AS wmedian_chars, cumw, totw
    FROM walked
    WHERE 2 * cumw >= totw
    ORDER BY n_chars ASC, doc_id ASC
    LIMIT 1
"""


QUERIES = {
    "range_window": q_range_window,
    "ols_fit": q_ols_fit,
    "mode_per_group": q_mode_per_group,
    "string_agg_ordered": q_string_agg_ordered,
    "gini": q_gini,
    "spearman_ranks": q_spearman_ranks,
    "weighted_median": q_weighted_median,
}

ORACLES = {
    "range_window": _RANGE_WINDOW_SQL,
    "ols_fit": _OLS_FIT_SQL,
    "mode_per_group": _MODE_SQL,
    "string_agg_ordered": _STRING_AGG_SQL,
    "gini": _GINI_SQL,
    "spearman_ranks": _SPEARMAN_SQL,
    "weighted_median": _WMEDIAN_SQL,
}


# ---------------------------------------------------------------- batch 31

TS_FROM, TS_TO = "2024-01-01", "2024-02-01"


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend: the MEDIAN of all pairwise slopes of the
    daily-revenue series — immune to the outlier days that wreck
    ``ols_fit``'s least squares. The O(n²) pair set is confined to the
    DAY-grain aggregate (a two-month window → bounded pairs; at any
    corpus size the day table stays calendar-sized), slopes compare as
    the same IEEE division in both engines, and the median picks the
    middle slope with a (dy, dx) tie-break so the answer is exact.
    Emits the slope as an exact (dy, dx) integer pair plus its double."""
    ev = table(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit(TS_FROM).cast("timestamp"))
        & (F.col("ts") < F.lit(TS_TO).cast("timestamp"))
    )
    day = F.datediff(F.col("ts").cast("date"), F.lit("1995-01-01").cast("date"))
    daily = ev.groupBy(day.alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("v")
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("a.d") < F.col("b.d")).select(
        (F.col("b.v") - F.col("a.v")).alias("dy"),
        (F.col("b.d") - F.col("a.d")).alias("dx"),
    )
    w = Window.orderBy(
        (F.col("dy") / F.col("dx")).asc(), F.col("dy").asc(), F.col("dx").asc()
    )
    n = pairs.count()
    mid = (n + 1) // 2
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == mid)
        .select(
            "dy",
            "dx",
            (F.col("dy") / F.col("dx")).alias("slope"),
            F.lit(n).cast("long").alias("n_pairs"),
        )
    )


_TS_SQL = f"""
    WITH daily AS (
        SELECT date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events
        WHERE ts >= TIMESTAMP '{TS_FROM}' AND ts < TIMESTAMP '{TS_TO}'
        GROUP BY 1
    ),
    pairs AS (
        SELECT CAST(b.v - a.v AS BIGINT) AS dy, CAST(b.d - a.d AS BIGINT) AS dx
        FROM daily a JOIN daily b ON a.d < b.d
    ),
    ranked AS (
        SELECT dy, dx,
               row_number() OVER (ORDER BY dy / CAST(dx AS DOUBLE) ASC,
                                  dy ASC, dx ASC) AS rn,
               count(*) OVER () AS n
        FROM pairs
    )
    SELECT dy, dx, dy / CAST(dx AS DOUBLE) AS slope,
           CAST(n AS BIGINT) AS n_pairs
    FROM ranked WHERE rn = (n + 1) // 2
"""


CAL_BINS = 10


def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier calibration (reliability diagram input): bucket the
    hashing-trick quality score into CAL_BINS equal-width bins and
    compare each bin's mean score against its empirical positive rate
    (label = lang == 'en', the same deterministic label
    quality_classifier trains against). One scored scan + one bin
    aggregate; counts/sums exact integers, the two rates divide with
    the same parenthesization in both engines."""
    from .textops import q_quality_classifier

    lab = table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("lang") == "en").cast("long").alias("label")
    )
    scored = (
        q_quality_classifier(spark, sf_dir)
        .select("doc_id", "score")
        .join(lab, "doc_id")
    )
    mm = scored.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    binned = scored.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.lit(CAL_BINS - 1),
            F.floor(
                ((F.col("score") - F.col("lo")).cast("double") * CAL_BINS)
                / (F.col("hi") - F.col("lo") + 1)
            ).cast("int"),
        ).alias("bin"),
        "score",
        "label",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("label").alias("n_pos"),
            F.sum("score").alias("sum_score"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            (F.col("n_pos") / F.col("n")).alias("pos_rate"),
            (F.col("sum_score") / F.col("n")).alias("mean_score"),
        )
    )


QUERIES["theil_sen"] = q_theil_sen
QUERIES["calibration_bins"] = q_calibration_bins
ORACLES["theil_sen"] = _TS_SQL


def _calibration_sql() -> str:
    from .textops import ORACLES as TX_ORACLES

    qc = TX_ORACLES["quality_classifier"]
    return f"""
        WITH qc AS MATERIALIZED ({qc}),
        scored AS (
            SELECT qc.doc_id, qc.score,
                   (d.lang = 'en')::BIGINT AS label
            FROM qc JOIN documents d ON d.doc_id = qc.doc_id
        ),
        mm AS (SELECT min(score) AS lo, max(score) AS hi FROM scored),
        binned AS (
            SELECT least({CAL_BINS} - 1,
                       CAST(floor(((score - lo) * {CAL_BINS})
                                  / CAST(hi - lo + 1 AS DOUBLE)) AS INT))
                       AS bin,
                   score, label
            FROM scored, mm
        )
        SELECT bin, count(*) AS n,
               CAST(sum(label) AS BIGINT) AS n_pos,
               CAST(sum(label) AS BIGINT) / CAST(count(*) AS DOUBLE) AS pos_rate,
               CAST(sum(score) AS BIGINT) / CAST(count(*) AS DOUBLE) AS mean_score
        FROM binned GROUP BY bin
    """


ORACLES["calibration_bins"] = _calibration_sql()



# ---------------------------------------------------------------- batch 38

WINS_LO_PCT, WINS_HI_PCT = 5, 95


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized aggregate per event type: clamp values to the exact
    [p5, p95] ORDER STATISTICS before summing — the robust-mean
    companion to mad_outliers (which flags) and bounded_contrib (which
    clamps per USER); winsorizing clamps per VALUE, the standard move
    before any mean-based metric on heavy-tailed web data. Bounds are
    exact order statistics at rank ceil(n·p/100) — one row_number
    window per type (partitioned, never global) feeds a per-type bound
    row, broadcast back for the clamped re-aggregate. All integer
    cents; at 10^12 rows the window pass is the exact path, and the
    documented production alternative is approx_percentile bounds with
    this same re-aggregate."""
    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    v = e.select("event_type", cents.alias("c"), "event_id")
    w = Window.partitionBy("event_type").orderBy(F.asc("c"), F.asc("event_id"))
    ranked = v.withColumn("rn", F.row_number().over(w))
    n = v.groupBy("event_type").agg(F.count("*").alias("n"))
    ranked = ranked.join(F.broadcast(n), "event_type")
    lo_rank = F.ceil(F.col("n") * WINS_LO_PCT / 100).cast("long")
    hi_rank = F.ceil(F.col("n") * WINS_HI_PCT / 100).cast("long")
    bounds = (
        ranked.filter((F.col("rn") == lo_rank) | (F.col("rn") == hi_rank))
        .groupBy("event_type")
        .agg(F.min("c").alias("lo_cents"), F.max("c").alias("hi_cents"))
    )
    clamped = v.join(F.broadcast(bounds), "event_type").select(
        "event_type", "lo_cents", "hi_cents",
        F.greatest(F.least(F.col("c"), F.col("hi_cents")), F.col("lo_cents"))
        .alias("wc"),
        F.col("c"),
    )
    return clamped.groupBy("event_type").agg(
        F.min("lo_cents").alias("lo_cents"),
        F.max("hi_cents").alias("hi_cents"),
        F.sum("c").alias("raw_sum_cents"),
        F.sum("wc").alias("wins_sum_cents"),
        F.sum(
            F.when(F.col("wc") != F.col("c"), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_clipped"),
        F.count("*").alias("n"),
    )


ORACLES["winsorize"] = f"""
    WITH v AS (
        SELECT event_type, event_id,
               CAST(round(value * 100) AS BIGINT) AS c
        FROM events
    ),
    ranked AS (
        SELECT event_type, c,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY c ASC, event_id ASC) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM v
    ),
    bounds AS (
        SELECT event_type,
               min(c) AS lo_cents, max(c) AS hi_cents
        FROM ranked
        WHERE rn = CAST(ceil(n * {WINS_LO_PCT} / 100.0) AS BIGINT)
           OR rn = CAST(ceil(n * {WINS_HI_PCT} / 100.0) AS BIGINT)
        GROUP BY event_type
    )
    SELECT v.event_type,
           min(b.lo_cents) AS lo_cents,
           max(b.hi_cents) AS hi_cents,
           CAST(sum(v.c) AS BIGINT) AS raw_sum_cents,
           CAST(sum(greatest(least(v.c, b.hi_cents), b.lo_cents))
                AS BIGINT) AS wins_sum_cents,
           CAST(sum(CASE WHEN greatest(least(v.c, b.hi_cents), b.lo_cents)
                              <> v.c THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           count(*) AS n
    FROM v JOIN bounds b ON v.event_type = b.event_type
    GROUP BY v.event_type
"""

QUERIES["winsorize"] = q_winsorize


# ---------------------------------------------------------------- batch 40

BOOT_B = 40  # bootstrap resamples
# Poisson(1) CDF in per-mille (floor literals — identical in both engines):
# P(X<=0)=.3679, <=1=.7358, <=2=.9197, <=3=.9810, <=4=.9963, else 5
BOOT_CDF = (367, 735, 919, 981, 996)
BOOT_LO_RANK, BOOT_MID_RANK, BOOT_HI_RANK = 2, 20, 39  # of B=40 sorted means


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-bootstrap confidence interval for the per-type mean —
    WITHOUT distributed RNG state: the classic scale trick replaces
    sample-with-replacement by a per-(row, resample) Poisson(1) weight
    (Chamandy et al., "Estimating Uncertainty for Massively Parallel
    Algorithms", and the streaming-bootstrap literature), and the
    Poisson draw here is a HASH of (event_id, resample) against fixed
    CDF literals — deterministic across engines, epochs, and retries
    like every sampler in this library. Plan: one map-side explode
    (×B), immediate partial aggregation on (type, resample) — nothing
    row-grain crosses the shuffle — then a B-sized sorted array per
    type gives the percentile bounds. Resample means are exact integer
    milli-cents (floor(Σk·c·1000 / Σk)); bounds are order statistics
    of 40 integers."""
    from .util import hex32

    e = table(spark, sf_dir, "events", spread=True)
    cents = F.round(F.col("value") * 100).cast("long")
    b = F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b")
    rows = e.select("event_type", "event_id", cents.alias("c")).select(
        "event_type", "event_id", "c", b
    )
    u = hex32(
        F.concat(F.col("event_id").cast("string"), F.lit(":"),
                 F.col("b").cast("string"))
    ) % 1000
    k = (
        F.when(u < BOOT_CDF[0], 0)
        .when(u < BOOT_CDF[1], 1)
        .when(u < BOOT_CDF[2], 2)
        .when(u < BOOT_CDF[3], 3)
        .when(u < BOOT_CDF[4], 4)
        .otherwise(5)
        .cast("long")
    )
    per_rs = (
        rows.select("event_type", "b", (k * F.col("c")).alias("kc"), k.alias("k"))
        .groupBy("event_type", "b")
        .agg(F.sum("kc").alias("skc"), F.sum("k").alias("sk"))
        .select(
            "event_type",
            F.floor(F.col("skc") * 1000 / F.col("sk")).cast("long").alias("m"),
        )
    )
    arr = per_rs.groupBy("event_type").agg(
        F.sort_array(F.collect_list("m")).alias("ms")
    )
    return arr.select(
        "event_type",
        F.element_at("ms", BOOT_LO_RANK).alias("ci_lo_milli"),
        F.element_at("ms", BOOT_MID_RANK).alias("boot_median_milli"),
        F.element_at("ms", BOOT_HI_RANK).alias("ci_hi_milli"),
        F.size("ms").cast("long").alias("n_resamples"),
    )


def _boot_sql() -> str:
    from .util import DUCK_HEX32

    h = DUCK_HEX32.format(
        x="(CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR))"
    )
    c0, c1, c2, c3, c4 = BOOT_CDF
    return f"""
    WITH rs AS (
        SELECT event_type, event_id,
               CAST(round(value * 100) AS BIGINT) AS c,
               unnest(generate_series(0, {BOOT_B - 1})) AS b
        FROM events
    ),
    weighted AS (
        SELECT event_type, b, c,
               CASE WHEN {h} % 1000 < {c0} THEN 0
                    WHEN {h} % 1000 < {c1} THEN 1
                    WHEN {h} % 1000 < {c2} THEN 2
                    WHEN {h} % 1000 < {c3} THEN 3
                    WHEN {h} % 1000 < {c4} THEN 4
                    ELSE 5 END::BIGINT AS k
        FROM rs
    ),
    means AS (
        SELECT event_type, b,
               CAST(floor(sum(k * c) * 1000.0 / sum(k)) AS BIGINT) AS m
        FROM weighted GROUP BY event_type, b
    ),
    arrs AS (
        SELECT event_type, list(m ORDER BY m) AS ms FROM means
        GROUP BY event_type
    )
    SELECT event_type,
           ms[{BOOT_LO_RANK}] AS ci_lo_milli,
           ms[{BOOT_MID_RANK}] AS boot_median_milli,
           ms[{BOOT_HI_RANK}] AS ci_hi_milli,
           len(ms)::BIGINT AS n_resamples
    FROM arrs
"""


QUERIES["bootstrap_ci"] = q_bootstrap_ci
ORACLES["bootstrap_ci"] = _boot_sql()
