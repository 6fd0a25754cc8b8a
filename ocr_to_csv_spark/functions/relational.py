"""Relational operator layer (SURVEY.md §2 mappings, driver contract M2).

Each ``q_*`` takes ``(spark, sf_dir)`` and returns a DataFrame; ``ORACLES``
holds the equivalent DuckDB SQL with identical column aliases. The queries
are the Spark-first re-expressions of the reference's operators:

- F1/F8 filters             (reference image_scraper.py:103, main.py:172)
- scan pruning              (Catalyst pushdown — verified via .explain)
- A1 argmax / top-1         (corrections.py:296-299)
- A5/A6 metric rollups      (main.py:98-105,159-162)
- J3 broadcast joins        (main.py:166-199)
- anti/semi joins           (rebuild resume logic + F9 blank-row)
- W1 dedup window           (sanity.py:1-44)
- W2 ordering window        (image_scraper.py:83-84 span ordering)
- O3/O5 sort / top-k        (main.py:176-180)
- set ops                   (rebuild unionByName fast-path merge)
- explode / pivot / JSON    (spans explode, main.py:182 row pivot, X17)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import hex32, table


def q_f1_kind_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: predicate dispatch — keep allowed kinds, aggregate the rest."""
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


def q_f8_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: regex predicate (date-string classifier analogue)."""
    return (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").rlike("merge (batch|table)"))
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
    )


def q_scan_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection+filter pushed into the parquet scan (2-col ReadSchema)."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n"),
        )
    )


def q_argmax_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/O5: per-group argmax with the reference's first-max tie-break."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("top_orderkey"),
            F.round("o_totalprice", 2).alias("top_price"),
        )
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 rollup (TPC-H Q1 shape): partial+final hash aggregate."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: small-dim broadcast join (explicit broadcast hint)."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(customer),
            orders.o_custkey == customer.c_custkey,
            "inner",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


def q_multiway_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained broadcast equi-joins over the dim hierarchy."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
        )
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (F9 drop semantics / checkpoint-resume primitive)."""
    c = table(spark, sf_dir, "customer")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.join(o, "c_custkey", "left_anti").select("c_custkey")


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: parts that appear in lineitem, counted per brand."""
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    return (
        p.join(li, "p_partkey", "left_semi")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"))
    )


def q_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: per-partition keep-max with first-occurrence tie-break
    (sanity.py:25 strict '>')."""
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.round("value", 2).alias("best_value"),
        )
    )


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: stable per-partition ordering (span order assignment)."""
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn")
    )


def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/O5: global top-k with deterministic tie-break (TakeOrderedAndProject)."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 set op: unionByName + distinct of two filtered branches."""
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
    )
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return o.unionByName(c).distinct()


def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode (spans-explode analogue): top-50 corpus words."""
    return (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(50)
    )


def q_pivot_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """main.py:182 row pivot analogue: conditional aggregation to columns."""
    e = table(spark, sf_dir, "events")

    def slot(t):
        return F.round(
            F.coalesce(F.sum(F.when(F.col("event_type") == t, F.col("value"))), F.lit(0.0)), 2
        )

    return e.groupBy("user_id").agg(
        slot("click").alias("click_v"),
        slot("view").alias("view_v"),
        slot("purchase").alias("purchase_v"),
        F.count("*").alias("n_events"),
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X17: JSON field extraction (alias-DB parse analogue)."""
    return (
        table(spark, sf_dir, "events")
        .select(F.get_json_object("props", "$.k").cast("int").alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"))
    )


def q_metrics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A6: run-metrics rollup (docs_done / span_count analogue)."""
    return (
        table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
    )


def q_date_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X16/F8: timestamp normalization to day buckets."""
    return (
        table(spark, sf_dir, "events")
        .select(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("n"))
    )




def q_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup/grouping-sets: per (source, lang) with subtotals — group
    keys coalesced to 'ALL' so null-vs-subtotal is unambiguous."""
    d = table(spark, sf_dir, "documents")
    return (
        d.rollup("source", "lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
        .select(
            F.coalesce("source", F.lit("ALL")).alias("source"),
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            "n",
            "chars",
        )
    )


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase hash agg)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.count("*").alias("n"),
        )
    )


def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric stats rollup: min/max/avg (sample stddev left out of the
    oracle check surface — engines agree but summation order would force
    coarse rounding; min/max are exact, avg rounded)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.min("value"), 4).alias("vmin"),
            F.round(F.max("value"), 4).alias("vmax"),
            F.round(F.avg("value"), 3).alias("vavg"),
        )
    )



def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: per user, a new session starts after a
    >30-minute silence; output per-session event counts. Lag + running
    conditional sum — the batch formulation of streaming session windows."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    secs = F.unix_timestamp("ts")  # whole seconds (== DuckDB epoch())
    gap = secs - F.lag(secs).over(w)
    starts = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = e.withColumn("new_sess", starts).withColumn(
        "session_id", F.sum("new_sess").over(w)
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("sess_start"),
        )
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent signup
    at-or-before it — expressed as a running max over the merged event
    stream (no range-join explosion; one window pass, same plan shape at
    any scale)."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_signup = F.max(
        F.when(F.col("event_type") == "signup", F.col("ts"))
    ).over(w)
    return (
        e.withColumn("asof_signup", last_signup)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.date_format("asof_signup", "yyyy-MM-dd HH:mm:ss").alias("signup_ts"),
        )
    )

def q_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec window: per-customer 3-row moving sum of order totals
    in date order (rowsBetween frame — the SURVEY §2.5 gap class the
    reference never needed but an analytics engine must cover)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("mov_sum_3"),
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete percentiles per group, computed from an explicit
    shared index formula (element ceil(q·n) of the sorted values) so the
    oracle is bit-comparable — built-in interpolated quantiles differ
    between engines in the last ulp and flip the rounding. This is the
    exact-quantile correctness baseline; at 100 TB the production path
    is ``approx_percentile`` (t-digest sketch, mergeable map-side)."""
    li = table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.sort_array(F.collect_list("l_extendedprice")).alias("vals"),
        F.count("*").alias("n"),
    )

    def disc(q: float):
        idx = F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("n"))).cast("int")
        return F.element_at(F.col("vals"), idx)

    return g.select(
        "l_returnflag",
        F.round(disc(0.5), 2).alias("p50"),
        F.round(disc(0.95), 2).alias("p95"),
        "n",
    )


def percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION percentile path: ``approx_percentile`` (KLL/t-digest
    style sketch, mergeable map-side — no per-group sorted array in
    memory, unlike the exact baseline ``q_percentiles``). Not oracle-
    hashed (sketches are engine-specific); regression-tested against the
    exact variant within rank tolerance and benched."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("p50"),
        F.expr("approx_percentile(l_extendedprice, 0.95, 10000)").alias("p95"),
        F.count("*").alias("n"),
    )


def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling — the first pass any 100 TB ingestion runs:
    per-column null count / distinct count / min / max, emitted as one
    narrow (column, metric...) table via a stacked aggregate."""
    o = table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    profs = [
        o.agg(
            F.lit(c).alias("column"),
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias("n_null"),
            F.count_distinct(F.col(c)).alias("n_distinct"),
            F.min(F.col(c).cast("string")).alias("min_str"),
            F.max(F.col(c).cast("string")).alias("max_str"),
        )
        for c in cols
    ]
    out = profs[0]
    for p in profs[1:]:
        out = out.unionByName(p)
    return out


IVL_WIN = 600  # interval width (sec) == bucket width


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join via bucketing — the scale-safe alternative
    to Spark's default plan for `p.ts BETWEEN i.lo AND i.hi` (a
    BroadcastNestedLoopJoin that is O(|intervals|*|points|)): each error
    event opens a 10-minute window; each interval is exploded into the
    1-2 coarse time buckets it overlaps, click events carry their single
    bucket, and the join becomes a shuffle EQUI-join on the bucket id
    followed by the exact containment filter. Bucket width == interval
    width bounds the explode factor at 2, and the equi-join partitions
    by time bucket — uniform at any scale. Sums are exact (cent-integer
    money, like pricing_summary)."""
    ev = table(spark, sf_dir, "events", spread=True)
    sec = F.unix_timestamp("ts").cast("long")
    ivl = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("ivl_id"),
        sec.alias("lo"),
        (sec + IVL_WIN).alias("hi"),
    )
    ivl_b = ivl.select(
        "*",
        F.explode(
            F.sequence(F.expr(f"lo div {IVL_WIN}"), F.expr(f"hi div {IVL_WIN}"))
        ).alias("b"),
    )
    pts = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        sec.alias("p"),
        F.expr(f"cast(unix_timestamp(ts) as long) div {IVL_WIN}").alias("b"),
    )
    hits = (
        ivl_b.join(pts, "b")
        .filter((F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi")))
        .select("ivl_id", "click_id", "cents")
        .distinct()  # an interval meets a click in at most one bucket, but stay safe
    )
    return hits.groupBy("ivl_id").agg(
        F.count("*").alias("n_clicks"),
        F.sum("cents").alias("click_cents"),
    )


HIST_W = 10_000  # bucket width in cents ($100)
HIST_NB = 50


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of line-item prices — one map-side bucket
    expression + one bounded-cardinality groupBy (partial agg combines
    map-side; the shuffle carries ≤ HIST_NB rows per task regardless of
    input size). Money as integer cents so bucket edges are exact."""
    li = table(spark, sf_dir, "lineitem", spread=True)
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    bucket = F.least(F.expr(f"cast(round(l_extendedprice * 100) as long) div {HIST_W}"), F.lit(HIST_NB - 1).cast("long"))
    return (
        li.select(bucket.alias("bucket"), cents.alias("cents"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (o_orderstatus, o_orderpriority): all four grouping
    sets in one Expand + single hash agg pass (vs four scans if written
    as unioned GROUP BYs). Keys coalesced to 'ALL' like
    rollup_hierarchy. Money summed as integer cents for exact parity."""
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.select("o_orderstatus", "o_orderpriority", cents.alias("cents"))
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("cents"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "cents",
        )
    )


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup -> click -> purchase: per user,
    the earliest signup, the earliest click strictly after it, the
    earliest purchase strictly after that — then one row per funnel
    stage with the user count. One groupBy(user) with conditional
    min-aggregates computed from per-user stage times (two chained
    window-free aggregations; no self-joins, no per-event state), so
    the plan is two key-partitioned agg passes at any scale."""
    e = table(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts").cast("long")
    # stage 1: earliest signup per user
    t = e.select("user_id", "event_type", sec.alias("s"))
    per_user = t.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("s"))).alias("t_signup")
    )
    # stage 2+3 need event-level comparison against t_signup: broadcast-size
    # per-user table? No — join back on user_id (key-partitioned equi-join).
    j = t.join(per_user, "user_id")
    stages = j.groupBy("user_id", "t_signup").agg(
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("s") > F.col("t_signup")),
                F.col("s"),
            )
        ).alias("t_click")
    )
    j2 = t.join(stages, "user_id")
    final = j2.groupBy("user_id", "t_signup", "t_click").agg(
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("s") > F.col("t_click")),
                F.col("s"),
            )
        ).alias("t_purchase")
    )
    return final.agg(
        F.count("*").alias("users"),
        F.sum(F.when(F.col("t_signup").isNotNull(), 1).otherwise(0)).alias("signup"),
        F.sum(
            F.when(F.col("t_signup").isNotNull() & F.col("t_click").isNotNull(), 1)
            .otherwise(0)
        ).alias("click_after_signup"),
        F.sum(
            F.when(
                F.col("t_signup").isNotNull()
                & F.col("t_click").isNotNull()
                & F.col("t_purchase").isNotNull(),
                1,
            ).otherwise(0)
        ).alias("purchase_after_click"),
    )


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history build from a changelog:
    each event opens a validity interval closed by the user's next event
    (lead over (user, ts)); the open interval is the current row. One
    window pass, keyed by user — the standard warehouse pattern for
    turning an append-only log into point-in-time joinable history."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event value in time order — the
    order-dependent-recurrence class (e_i = (3*e_{i-1} + v_i) div 4 in
    integer cents, exact in any engine): values are gathered into one
    ordered array per user (keyed groupBy) and folded with a sequential
    left fold, the same sentinel-init fold the DuckDB oracle runs.
    State per user is O(events-per-user); the fold itself is map-side
    after the single keyed shuffle."""
    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    sec = F.unix_timestamp("ts").cast("long")
    arr = F.transform(
        F.sort_array(
            F.collect_list(F.struct(sec.alias("s"), F.col("event_id"), cents.alias("c")))
        ),
        lambda x: x["c"],
    )
    fold = F.aggregate(
        arr,
        F.lit(-1).cast("long"),
        lambda acc, x: F.when(acc < 0, x).otherwise(
            F.floor((acc * 3 + x) / 4).cast("long")
        ),
    )
    return (
        e.groupBy("user_id")
        .agg(fold.alias("ewma_cents"), F.count("*").alias("n_events"))
    )


SLIDE_W = 600  # window width (sec)
SLIDE_S = 300  # slide step (sec)


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (sliding) time windows in batch: 10-minute windows
    every 5 minutes — each event belongs to exactly W/S = 2 windows, so
    it is exploded into its two window starts map-side and aggregated
    with one bounded-fan-out groupBy. This is the batch twin of
    Structured Streaming's window(ts, '10 minutes', '5 minutes')."""
    e = table(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts").cast("long")
    base = sec - (sec % SLIDE_S)  # all-integer bucket floor
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        e.select(
            F.explode(F.array(base - SLIDE_S, base)).alias("win_start"),
            cents.alias("cents"),
        )
        .groupBy("win_start")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("cents"))
    )


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated fact⋈dim join: the events fact side is salted and
    the per-user tier dim is replicated once per salt, so a hot user
    spreads across 16 reducers (plans/skew.salted_join). Result is
    provably identical to the plain join — the oracle runs the unsalted
    formulation. Broadcast would win for THIS dictionary-sized dim; the
    salted shape is the one that survives when both sides are beyond
    broadcast size and the key histogram is ugly."""
    from ..plans.skew import salted_join

    e = table(spark, sf_dir, "events")
    dim = (
        e.select("user_id").distinct().withColumn("tier", F.col("user_id") % 5)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        salted_join(e.select("user_id", cents.alias("cents")), dim, ["user_id"])
        .groupBy("tier")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("cents"))
    )


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the events table arrives as 4
    simulated ingest batches (event_id % 4); each batch is reduced to
    mergeable partials (count/sum/min/max) and merged into the running
    state with one state-sized keyed groupBy (plans/incremental.py) —
    history is never rescanned. The oracle is the full recompute over
    all events: merged state == recompute, the correctness contract of
    every incremental pipeline."""
    from ..plans.incremental import merge_aggregates, partial_aggregates

    e = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    state = None
    for b in range(4):
        batch = e.filter(F.col("event_id") % 4 == b)
        partials = partial_aggregates(batch, ["event_type"], "cents")
        state = partials if state is None else merge_aggregates(
            state, partials, ["event_type"]
        )
    return state


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt wide→long (the inverse of pivot_rows): per-part
    numeric attributes become (attr, val) rows via stack() — a Generate
    node, pure map-side, no shuffle at all until the downstream agg."""
    p = table(spark, sf_dir, "part")
    long = p.select(
        "p_partkey",
        F.expr(
            "stack(2, 'size', cast(p_size as bigint), "
            "'retail_cents', cast(round(p_retailprice * 100) as bigint)) "
            "AS (attr, val)"
        ),
    )
    return long.groupBy("attr").agg(
        F.count("*").alias("n"),
        F.sum("val").alias("total"),
        F.min("val").alias("lo"),
        F.max("val").alias("hi"),
    )


def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile assignment per customer-segment by account balance
    (ntile window) rolled up to per-(segment, quartile) stats — the
    rank-bucketing window class (ntile/percent_rank) the other window
    queries don't cover. Balance in integer cents for exact parity."""
    c = table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.asc("c_acctbal"), F.asc("c_custkey")
    )
    q = c.select(
        "c_mktsegment", cents.alias("cents"), F.ntile(4).over(w).alias("quartile")
    )
    return q.groupBy("c_mktsegment", "quartile").agg(
        F.count("*").alias("n"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
    )


def q_window_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank windows (percent_rank + cume_dist) — the remaining
    window subtype after row_number/rank/ntile/frames: per market
    segment, each of the 30 largest accounts with its exact relative
    rank. Both functions are exact rationals ((rank-1)/(n-1), cum n/N)
    computed identically by every engine; balances in integer cents pin
    the ordering."""
    c = table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.asc("cents"), F.asc("c_custkey")
    )
    ranked = c.select(
        "c_custkey", "c_mktsegment", cents.alias("cents")
    ).select(
        "c_custkey",
        "c_mktsegment",
        "cents",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
    w2 = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("cents"), F.asc("c_custkey")
    )
    return (
        ranked.withColumn("rn_", F.row_number().over(w2))
        .filter(F.col("rn_") <= 30)
        .select("c_custkey", "c_mktsegment", "cents", "pct_rank", "cume")
    )


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest-string join (the scale twin of the pipeline's
    alias fuzzy matcher, J1/J2): for every part name, its closest OTHER
    name by Levenshtein distance among candidates sharing the same
    leading word — band-then-verify, the standard fuzzy-join shape where
    the quadratic edit-distance work is confined WITHIN bands instead of
    all-pairs. First-max tie-break on the smaller partkey.

    At 100 TB the band key graduates from first-word to character-q-gram
    LSH (same join shape); Levenshtein is a JVM built-in on both engines
    with the classic unit-cost semantics, so the oracle is exact.

    r5 cost rewrite (bit-identical results, 77 s → ~2 s at sf0.1): the
    edit distance depends only on the NAME PAIR, so verify runs once per
    distinct (band, name) pair instead of once per row pair — the same
    distinct-verify/expand-back move as ``ppjoin_pairs``. Per distinct
    name group we keep its two smallest keys; then for a key k of name
    na: if na has duplicates in the band, the nearest neighbour is the
    smallest OTHER key of the same name at distance 0 (distinct names
    are always at distance >= 1); otherwise it is the distance-minimal
    other distinct name, tie-broken on that group's minimal key (the
    group minimum IS the minimal mk among all tied candidate rows). The
    per-group stats are keyed aggregates; the distinct-pair verify is
    vocabulary-sized; the row-level expansion is two equi-joins — no
    window over candidate pairs anywhere. Degenerate worst case (all
    names unique) falls back to exactly the original band-verify
    volume."""
    p = table(spark, sf_dir, "part")
    n = p.select(
        "p_partkey", "p_name", F.split("p_name", " ")[0].alias("w1")
    )
    grp = n.groupBy("w1", "p_name").agg(
        F.count("*").alias("cnt"),
        F.min("p_partkey").alias("k1"),
    )
    k2 = (
        n.join(grp.select("w1", "p_name", "k1"), ["w1", "p_name"])
        .filter(F.col("p_partkey") != F.col("k1"))
        .groupBy("w1", "p_name")
        .agg(F.min("p_partkey").alias("k2"))
    )
    grp = grp.join(k2, ["w1", "p_name"], "left")
    da = grp.select("w1", F.col("p_name").alias("na"))
    db = grp.select(
        F.col("w1").alias("w1b"), F.col("p_name").alias("nb"),
        F.col("k1").alias("bk"),
    )
    best = (
        da.join(db, (da["w1"] == db["w1b"]) & (da["na"] != db["nb"]))
        .select(
            "w1",
            F.col("na").alias("p_name"),
            F.struct(
                F.levenshtein("na", "nb").alias("d"),
                F.col("bk").alias("mk"),
            ).alias("cand"),
        )
        .groupBy("w1", "p_name")
        .agg(F.min("cand").alias("b"))
    )
    same_mk = F.when(
        F.col("p_partkey") == F.col("k1"), F.col("k2")
    ).otherwise(F.col("k1"))
    pick = F.when(
        F.col("cnt") > 1,
        F.struct(F.lit(0).alias("d"), same_mk.alias("mk")),
    ).otherwise(F.col("b"))
    return (
        n.join(grp, ["w1", "p_name"])
        .join(best, ["w1", "p_name"], "left")
        .filter((F.col("cnt") > 1) | F.col("b").isNotNull())
        .select(
            "p_partkey",
            pick["mk"].alias("match_key"),
            pick["d"].alias("dist"),
        )
    )


def q_resample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill (resample-to-daily): per user, daily event
    counts with missing days ZERO-FILLED across the user's own observed
    span — the densification step before any rolling-window or
    day-over-day computation (a gap would silently shrink the window).

    The day spine is generated per key with ``sequence(min_day,
    max_day)`` + explode — map-side after one per-key min/max agg, no
    calendar dim table and no cross join of users × all days (which at
    10^9 users × years would dwarf the data). The fill join is a keyed
    left join against the per-(user, day) counts."""
    e = table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day"))
    counts = days.groupBy("user_id", "day").agg(F.count("*").alias("n"))
    spine = (
        days.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1")).alias("day"),
        )
    )
    return (
        spine.join(counts, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
    )


def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic: per candidate join/agg key, the
    group-size distribution (key count, max, exact median, skew factor
    = max/mean) — the measurement that decides whether a key needs the
    salted path (``salted_join`` / ``salted_wordcount``) before a plan
    ships. Median uses the explicit discrete-index formula from
    ``q_percentiles`` for cross-engine exactness. The per-key size agg
    partial-aggregates map-side; the collect_list holds one int per
    DISTINCT key (at 100 TB, feed the same rollup from a sampled or
    sketched size table instead)."""
    e = table(spark, sf_dir, "events")
    sizes = e.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    g = sizes.groupBy("event_type").agg(
        F.count("*").alias("n_keys"),
        F.max("n").alias("max_n"),
        F.sum("n").alias("total_rows"),
        F.sort_array(F.collect_list("n")).alias("vals"),
    )
    med_idx = F.greatest(F.lit(1), F.ceil(F.lit(0.5) * F.col("n_keys"))).cast(
        "int"
    )
    return g.select(
        "event_type",
        "n_keys",
        "max_n",
        F.element_at(F.col("vals"), med_idx).alias("p50_n"),
        F.round(
            F.col("max_n") * F.col("n_keys") / F.col("total_rows"), 2
        ).alias("skew_factor"),
    )


HLL_M = 64  # registers; std err ≈ 1.04/sqrt(64) = 13%


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch, built from scratch as pure
    expressions (m=64 registers, 26-bit rho domain, alpha_64=0.709,
    linear-counting small-range correction) and audited against the exact
    ``count_distinct`` per group.

    This is the mergeable-sketch alternative to exact distinct at 100 TB:
    the shuffle carries at most m register rows per group (a groupBy MAX —
    partial-aggregates map-side and never widens with cardinality), vs
    ``count_distinct``'s shuffle of every distinct key. The register table
    is also unionable across ingest batches (max is associative), which
    exact distinct is not. Determinism: md5-derived hash (``hex32``) and
    integer register math make the sketch — and hence the DuckDB oracle —
    bit-reproducible; the only floats are the final alpha/ln steps,
    computed by the identical formula on both sides and rounded."""
    e = table(spark, sf_dir, "events")
    h = hex32(F.concat(F.lit("hll|"), F.col("user_id").cast("string")))
    hashed = e.select(
        "event_type",
        (h % HLL_M).alias("bucket"),
        F.floor(h / HLL_M).cast("long").alias("w"),
    ).select(
        "event_type", "bucket",
        F.when(F.col("w") == 0, F.lit(27))
        .otherwise(F.lit(27) - F.length(F.conv(F.col("w"), 10, 2)))
        .cast("int")
        .alias("rho"),
    )
    regs = hashed.groupBy("event_type", "bucket").agg(F.max("rho").alias("m"))
    per = regs.groupBy("event_type").agg(
        F.count("*").alias("npresent"),
        F.sum(F.expr("shiftleft(1L, cast(27 - m as int))")).alias("s"),
    )
    T = F.col("s") + (F.lit(HLL_M) - F.col("npresent")) * F.lit(1 << 27)
    raw = F.lit(0.709) * F.lit(float(HLL_M * HLL_M * (1 << 27))) / T
    V = F.lit(HLL_M) - F.col("npresent")
    est = (
        F.when(
            (raw <= F.lit(2.5 * HLL_M)) & (V > 0),
            F.round(F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / V), 2),
        )
        .otherwise(F.round(raw, 2))
        .alias("hll_est")
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    sk = per.select("event_type", est)
    return sk.join(exact, "event_type").select(
        "event_type",
        "n_exact",
        "hll_est",
        F.round(
            F.abs(F.col("hll_est") - F.col("n_exact")) / F.col("n_exact") * 100, 2
        ).alias("err_pct"),
    )


QUERIES = {
    "f1_kind_filter": q_f1_kind_filter,
    "f8_regex_filter": q_f8_regex_filter,
    "scan_prune": q_scan_prune,
    "argmax_top1": q_argmax_top1,
    "pricing_summary": q_pricing_summary,
    "broadcast_join": q_broadcast_join,
    "multiway_dims": q_multiway_dims,
    "anti_join": q_anti_join,
    "semi_join": q_semi_join,
    "window_dedup": q_window_dedup,
    "window_rank": q_window_rank,
    "topk": q_topk,
    "set_union": q_set_union,
    "explode_tokens": q_explode_tokens,
    "pivot_rows": q_pivot_rows,
    "json_extract": q_json_extract,
    "metrics_rollup": q_metrics_rollup,
    "date_bucket": q_date_bucket,
    "rollup_hierarchy": q_rollup_hierarchy,
    "count_distinct": q_count_distinct,
    "stats_agg": q_stats_agg,
    "sessionize": q_sessionize,
    "asof_join": q_asof_join,
    "moving_sum": q_moving_sum,
    "percentiles": q_percentiles,
    "profile": q_profile,
    "interval_join": q_interval_join,
    "histogram": q_histogram,
    "cube": q_cube,
    "event_funnel": q_event_funnel,
    "scd2": q_scd2,
    "ewma": q_ewma,
    "sliding_window": q_sliding_window,
    "salted_join": q_salted_join,
    "incremental_agg": q_incremental_agg,
    "unpivot": q_unpivot,
    "ntile": q_ntile,
    "hll_distinct": q_hll_distinct,
    "key_skew": q_key_skew,
    "resample_daily": q_resample_daily,
    "fuzzy_match": q_fuzzy_match,
    "window_pct": q_window_pct,
}

ORACLES = {
    "f1_kind_filter": """
        SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
        FROM events WHERE event_type IN ('click', 'view')
        GROUP BY event_type
    """,
    "f8_regex_filter": """
        SELECT lang, count(*) AS n
        FROM documents WHERE regexp_matches(text, 'merge (batch|table)')
        GROUP BY lang
    """,
    "scan_prune": """
        SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem WHERE l_shipdate >= TIMESTAMP '1999-01-01'
        GROUP BY l_returnflag
    """,
    "argmax_top1": """
        SELECT o_custkey, top_orderkey, top_price FROM (
            SELECT o_custkey, o_orderkey AS top_orderkey,
                   round(o_totalprice, 2) AS top_price,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders
        ) WHERE rn = 1
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 2) AS avg_qty,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "broadcast_join": """
        SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue, count(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "multiway_dims": """
        SELECT r_name, count(*) AS n, round(avg(c_acctbal), 2) AS avg_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "anti_join": """
        SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    "semi_join": """
        SELECT p_brand, count(*) AS n FROM part
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        GROUP BY p_brand
    """,
    "window_dedup": """
        SELECT user_id, event_type, event_id, best_value FROM (
            SELECT user_id, event_type, event_id, round(value, 2) AS best_value,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY value DESC, event_id ASC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "window_rank": """
        SELECT user_id, event_id, rn FROM (
            SELECT user_id, event_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts ASC, event_id ASC) AS rn
            FROM events
        ) WHERE rn <= 3
    """,
    "topk": """
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
    """,
    "set_union": """
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        UNION
        SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
    """,
    "explode_tokens": """
        SELECT word, count(*) AS n FROM (
            SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                      t -> t <> '')) AS word
            FROM documents
        ) GROUP BY word ORDER BY n DESC, word ASC LIMIT 50
    """,
    "pivot_rows": """
        SELECT user_id,
               round(coalesce(sum(CASE WHEN event_type = 'click' THEN value END), 0), 2) AS click_v,
               round(coalesce(sum(CASE WHEN event_type = 'view' THEN value END), 0), 2) AS view_v,
               round(coalesce(sum(CASE WHEN event_type = 'purchase' THEN value END), 0), 2) AS purchase_v,
               count(*) AS n_events
        FROM events GROUP BY user_id
    """,
    "json_extract": """
        SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, count(*) AS n
        FROM events GROUP BY k
    """,
    "metrics_rollup": """
        SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
               round(avg(n_chars), 2) AS avg_chars
        FROM documents GROUP BY source
    """,
    "date_bucket": """
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY day
    """,
    "rollup_hierarchy": """
        SELECT coalesce(source, 'ALL') AS source, coalesce(lang, 'ALL') AS lang,
               count(*) AS n, sum(n_chars)::BIGINT AS chars
        FROM documents GROUP BY ROLLUP (source, lang)
    """,
    "count_distinct": """
        SELECT event_type, count(DISTINCT user_id) AS users, count(*) AS n
        FROM events GROUP BY event_type
    """,
    "stats_agg": """
        SELECT event_type, round(min(value), 4) AS vmin,
               round(max(value), 4) AS vmax, round(avg(value), 3) AS vavg
        FROM events GROUP BY event_type
    """,
    "sessionize": """
        WITH g AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(floor(epoch(ts))) OVER w IS NULL
                             OR floor(epoch(ts)) - lag(floor(epoch(ts))) OVER w > 1800
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        s AS (
            SELECT user_id, event_id, ts,
                   sum(new_sess) OVER (PARTITION BY user_id
                                       ORDER BY ts ASC, event_id ASC)::BIGINT AS session_id
            FROM g
        )
        SELECT user_id, session_id, count(*) AS n_events,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start
        FROM s GROUP BY user_id, session_id
    """,
    "asof_join": """
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
               strftime(asof_signup, '%Y-%m-%d %H:%M:%S') AS signup_ts
        FROM (
            SELECT event_id, user_id, ts, event_type,
                   max(CASE WHEN event_type = 'signup' THEN ts END)
                       OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_signup
            FROM events
        ) WHERE event_type = 'purchase'
    """,
    "moving_sum": """
        SELECT o_orderkey, o_custkey,
               round(sum(o_totalprice)
                     OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate ASC, o_orderkey ASC
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
                   AS mov_sum_3
        FROM orders
    """,
    "percentiles": """
        SELECT l_returnflag,
               round(vals[greatest(1, CAST(ceil(0.5 * n) AS INT))], 2) AS p50,
               round(vals[greatest(1, CAST(ceil(0.95 * n) AS INT))], 2) AS p95,
               n
        FROM (
            SELECT l_returnflag, list_sort(list(l_extendedprice)) AS vals,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag
        )
    """,
    "profile": """
        SELECT 'o_orderkey' AS "column", count(*) AS n_rows,
               sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
               count(DISTINCT o_orderkey) AS n_distinct,
               min(o_orderkey::VARCHAR) AS min_str, max(o_orderkey::VARCHAR) AS max_str
        FROM orders
        UNION ALL
        SELECT 'o_custkey', count(*),
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT,
               count(DISTINCT o_custkey),
               min(o_custkey::VARCHAR), max(o_custkey::VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', count(*),
               sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT,
               count(DISTINCT o_orderstatus),
               min(o_orderstatus), max(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*),
               sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)::BIGINT,
               count(DISTINCT o_orderpriority),
               min(o_orderpriority), max(o_orderpriority)
        FROM orders
    """,
    "interval_join": """
        SELECT i.event_id AS ivl_id, count(*) AS n_clicks,
               sum(c.cents)::BIGINT AS click_cents
        FROM (SELECT event_id, floor(epoch(ts))::BIGINT AS lo,
                     floor(epoch(ts))::BIGINT + 600 AS hi
              FROM events WHERE event_type = 'error') i
        JOIN (SELECT event_id, round(value * 100)::BIGINT AS cents,
                     floor(epoch(ts))::BIGINT AS p
              FROM events WHERE event_type = 'click') c
          ON c.p >= i.lo AND c.p < i.hi
        GROUP BY i.event_id
    """,
    "unpivot": """
        SELECT attr, count(*) AS n, sum(val)::BIGINT AS total,
               min(val) AS lo, max(val) AS hi
        FROM (
            SELECT p_partkey, 'size' AS attr, p_size::BIGINT AS val FROM part
            UNION ALL
            SELECT p_partkey, 'retail_cents', round(p_retailprice * 100)::BIGINT
            FROM part
        )
        GROUP BY attr
    """,
    "ntile": """
        SELECT c_mktsegment, quartile, count(*) AS n,
               min(cents) AS lo_cents, max(cents) AS hi_cents
        FROM (
            SELECT c_mktsegment, round(c_acctbal * 100)::BIGINT AS cents,
                   ntile(4) OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal ASC, c_custkey ASC)
                       AS quartile
            FROM customer
        )
        GROUP BY c_mktsegment, quartile
    """,
    "incremental_agg": """
        SELECT event_type, count(*) AS n,
               sum(round(value * 100)::BIGINT)::BIGINT AS total,
               min(round(value * 100)::BIGINT) AS lo,
               max(round(value * 100)::BIGINT) AS hi
        FROM events
        GROUP BY event_type
    """,
    "salted_join": """
        SELECT u.tier, count(*) AS n,
               sum(round(e.value * 100)::BIGINT)::BIGINT AS cents
        FROM events e
        JOIN (SELECT DISTINCT user_id, user_id % 5 AS tier FROM events) u
          USING (user_id)
        GROUP BY u.tier
    """,
    "scd2": """
        SELECT user_id, event_id, event_type AS state,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
               strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
               lead(ts) OVER w IS NULL AS is_current
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    "ewma": """
        SELECT user_id,
               list_reduce(
                   list_prepend(-1::BIGINT,
                       list(round(value * 100)::BIGINT
                            ORDER BY floor(epoch(ts))::BIGINT, event_id)),
                   (acc, x) -> CASE WHEN acc < 0 THEN x
                                    ELSE (acc * 3 + x) // 4 END
               ) AS ewma_cents,
               count(*) AS n_events
        FROM events
        GROUP BY user_id
    """,
    "sliding_window": """
        SELECT win_start, count(*) AS n, sum(cents)::BIGINT AS cents
        FROM (
            SELECT (floor(epoch(ts))::BIGINT // 300) * 300 - 300 AS win_start,
                   round(value * 100)::BIGINT AS cents
            FROM events
            UNION ALL
            SELECT (floor(epoch(ts))::BIGINT // 300) * 300,
                   round(value * 100)::BIGINT
            FROM events
        )
        GROUP BY win_start
    """,
    "cube": """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "event_funnel": """
        WITH t AS (
            SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS s FROM events
        ),
        u1 AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'signup' THEN s END) AS t_signup
            FROM t GROUP BY user_id
        ),
        u2 AS (
            SELECT t.user_id, u1.t_signup,
                   min(CASE WHEN event_type = 'click' AND s > t_signup
                            THEN s END) AS t_click
            FROM t JOIN u1 USING (user_id)
            GROUP BY t.user_id, u1.t_signup
        ),
        u3 AS (
            SELECT t.user_id, u2.t_signup, u2.t_click,
                   min(CASE WHEN event_type = 'purchase' AND s > t_click
                            THEN s END) AS t_purchase
            FROM t JOIN u2 USING (user_id)
            GROUP BY t.user_id, u2.t_signup, u2.t_click
        )
        SELECT count(*) AS users,
               sum(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                   AS signup,
               sum(CASE WHEN t_signup IS NOT NULL AND t_click IS NOT NULL
                        THEN 1 ELSE 0 END)::BIGINT AS click_after_signup,
               sum(CASE WHEN t_signup IS NOT NULL AND t_click IS NOT NULL
                             AND t_purchase IS NOT NULL
                        THEN 1 ELSE 0 END)::BIGINT AS purchase_after_click
        FROM u3
    """,
    "histogram": """
        SELECT least(round(l_extendedprice * 100)::BIGINT // 10000, 49) AS bucket,
               count(*) AS n,
               min(round(l_extendedprice * 100)::BIGINT) AS min_cents,
               max(round(l_extendedprice * 100)::BIGINT) AS max_cents
        FROM lineitem
        GROUP BY 1
    """,
}

from .util import DUCK_HEX32 as _DH32  # noqa: E402

_HLL_H = _DH32.format(x="'hll|' || user_id::VARCHAR")
ORACLES["hll_distinct"] = f"""
    WITH h AS (
        SELECT event_type, user_id,
               ({_HLL_H}) % 64 AS bucket,
               ({_HLL_H}) // 64 AS w
        FROM events
    ),
    r AS (
        SELECT event_type, bucket,
               max(CASE WHEN w = 0 THEN 27
                        ELSE 27 - length(bin(w)) END) AS m
        FROM h GROUP BY event_type, bucket
    ),
    per AS (
        SELECT event_type, count(*) AS npresent,
               sum(1::BIGINT << CAST(27 - m AS INT)) AS s
        FROM r GROUP BY event_type
    ),
    sk AS (
        SELECT event_type,
               CASE WHEN (0.709 * 549755813888.0
                          / (s + (64 - npresent) * 134217728)) <= 160.0
                         AND (64 - npresent) > 0
                    THEN round(64.0 * ln(64.0 / (64 - npresent)), 2)
                    ELSE round(0.709 * 549755813888.0
                               / (s + (64 - npresent) * 134217728), 2)
               END AS hll_est
        FROM per
    ),
    ex AS (
        SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events
        GROUP BY event_type
    )
    SELECT sk.event_type, ex.n_exact::BIGINT AS n_exact, sk.hll_est,
           round(abs(sk.hll_est - ex.n_exact) / ex.n_exact * 100, 2) AS err_pct
    FROM sk JOIN ex USING (event_type)
"""

ORACLES["key_skew"] = """
    WITH sizes AS (
        SELECT event_type, user_id, count(*) AS n
        FROM events GROUP BY event_type, user_id
    ),
    g AS (
        SELECT event_type,
               count(*) AS n_keys,
               max(n) AS max_n,
               sum(n) AS total_rows,
               list_sort(list(n)) AS vals
        FROM sizes GROUP BY event_type
    )
    SELECT event_type,
           n_keys::BIGINT AS n_keys,
           max_n::BIGINT AS max_n,
           vals[greatest(1, ceil(0.5 * n_keys))::INT]::BIGINT AS p50_n,
           round(max_n * n_keys / total_rows::DOUBLE, 2) AS skew_factor
    FROM g
"""

ORACLES["resample_daily"] = """
    WITH days AS (
        SELECT user_id, ts::DATE AS day FROM events
    ),
    counts AS (
        SELECT user_id, day, count(*) AS n FROM days GROUP BY user_id, day
    ),
    spine AS (
        SELECT user_id, unnest(generate_series(min(day), max(day),
                                               INTERVAL 1 DAY))::DATE AS day
        FROM days GROUP BY user_id
    )
    SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
           coalesce(c.n, 0)::BIGINT AS n
    FROM spine s
    LEFT JOIN counts c ON c.user_id = s.user_id AND c.day = s.day
"""

ORACLES["fuzzy_match"] = """
    WITH n AS (
        SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS w1 FROM part
    ),
    cand AS (
        SELECT a.p_partkey AS k, b.p_partkey AS mk,
               levenshtein(a.p_name, b.p_name) AS dist
        FROM n a JOIN n b ON a.w1 = b.w1 AND a.p_partkey <> b.p_partkey
    )
    SELECT k AS p_partkey, mk AS match_key, dist::INT AS dist
    FROM cand
    QUALIFY row_number() OVER (PARTITION BY k ORDER BY dist, mk) = 1
"""

ORACLES["window_pct"] = """
    WITH ranked AS (
        SELECT c_custkey, c_mktsegment,
               round(c_acctbal * 100)::BIGINT AS cents,
               round(percent_rank() OVER (PARTITION BY c_mktsegment
                     ORDER BY round(c_acctbal * 100)::BIGINT, c_custkey), 6)
                   AS pct_rank,
               round(cume_dist() OVER (PARTITION BY c_mktsegment
                     ORDER BY round(c_acctbal * 100)::BIGINT, c_custkey), 6)
                   AS cume
        FROM customer
    )
    SELECT c_custkey, c_mktsegment, cents, pct_rank, cume
    FROM ranked
    QUALIFY row_number() OVER (PARTITION BY c_mktsegment
                               ORDER BY cents DESC, c_custkey) <= 30
"""


def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) over parts: the points not dominated
    on (minimize price, maximize size). The distributed plan is the
    classic two-phase skyline: (1) a PARTITION-LOCAL prefilter — within
    each Spark partition, sort by price and keep rows whose size exceeds
    the running max (dropping a row here is always safe: its dominator
    sits in the same partition) — then (2) the exact pass over the tiny
    survivor union (local skylines are logarithmic-sized on non-adversarial
    data), whose single-partition window touches only survivors, never
    the input. Equal-price points first collapse to their max size in an
    ordinary keyed aggregate, so dominance reduces to "strictly cheaper
    with size >= mine" and both window passes share one predicate."""
    p = table(spark, sf_dir, "part")
    pts = (
        p.groupBy("p_retailprice")
        .agg(F.max("p_size").alias("size"))
        .select(
            F.col("p_retailprice").alias("price"),
            F.col("size").cast("long").alias("size"),
        )
    )
    keep = lambda c: c.isNull() | (c < F.col("size"))
    w_local = (
        Window.partitionBy(F.spark_partition_id())
        .orderBy(F.asc("price"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    survivors = (
        pts.withColumn("pm", F.max("size").over(w_local))
        .filter(keep(F.col("pm")))
        .drop("pm")
    )
    w_global = Window.orderBy(F.asc("price")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        survivors.withColumn("pm", F.max("size").over(w_global))
        .filter(keep(F.col("pm")))
        .drop("pm")
    )


QUERIES["skyline"] = q_skyline

ORACLES["skyline"] = """
    WITH pts AS (
        SELECT p_retailprice AS price, max(p_size)::BIGINT AS size
        FROM part GROUP BY 1
    )
    SELECT price, size FROM pts a
    WHERE NOT EXISTS (
        SELECT 1 FROM pts b WHERE b.price < a.price AND b.size >= a.size
    )
"""


QSK_NB = 128  # sketch buckets per group


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width quantile sketch per event type, AUDITED
    against the exact quantile (the hll_distinct/heavy_hitters pattern:
    the sketch is the 100 TB path, the exact computation is the
    small-scale truth it is scored against). Money moves as integer
    cents, the bucket width is the exact integer ``(mx-mn) div 128 + 1``
    from one tiny per-group stats aggregate broadcast back, so the
    sketch build is map-side expressions + a (type, bucket) groupBy that
    ships ≤128 rows per group whatever the input size — and, unlike a
    sorted-array exact quantile, the buckets merge associatively across
    ingest batches. Quantile estimate = upper edge of the first bucket
    whose cumulative count reaches ceil(q*n); the reported err_cents is
    bounded by one bucket width. Exact side reuses the q_percentiles
    discrete formula (element ceil(q*n) of the sorted cents)."""
    ev = table(spark, sf_dir, "events", spread=True)
    base = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("c")
    )
    stats = base.groupBy("event_type").agg(
        F.min("c").alias("mn"), F.max("c").alias("mx"),
        F.count("*").alias("n"),
        F.sort_array(F.collect_list("c")).alias("vals"),
    ).withColumn(
        "w", ((F.col("mx") - F.col("mn")) / QSK_NB).cast("long") + 1
    )
    sk = stats.select("event_type", "mn", "w")
    hist = (
        base.join(F.broadcast(sk), "event_type")
        .select(
            "event_type",
            F.least(
                F.lit(QSK_NB - 1).cast("long"),
                ((F.col("c") - F.col("mn")) / F.col("w")).cast("long"),
            ).alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("bn"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("bn").over(wcum))

    def pick(num: int, den: int):
        # first bucket whose cumulative count reaches ceil(num*n/den)
        thr = F.expr(f"({num} * n + {den} - 1) div {den}")
        return F.min(F.when(F.col("cum") >= thr, F.col("bucket")))

    agg = (
        cum.join(F.broadcast(stats.select("event_type", "n")), "event_type")
        .groupBy("event_type")
        .agg(
            pick(1, 2).alias("b50"),
            pick(9, 10).alias("b90"),
            pick(99, 100).alias("b99"),
        )
    )
    est = lambda b: F.least(F.col("mx"), F.col("mn") + (F.col(b) + 1) * F.col("w"))
    exact = lambda num, den: F.element_at(
        F.col("vals"), F.expr(f"cast(({num} * n + {den} - 1) div {den} as int)")
    )
    wide = agg.join(stats, "event_type").select(
        "event_type",
        est("b50").alias("e50"), exact(1, 2).alias("x50"),
        est("b90").alias("e90"), exact(9, 10).alias("x90"),
        est("b99").alias("e99"), exact(99, 100).alias("x99"),
        "w",
    )
    return wide.select(
        "event_type", "w",
        F.expr(
            "stack(3, 0.5D, e50, x50, 0.9D, e90, x90, 0.99D, e99, x99) "
            "as (p, est_cents, exact_cents)"
        ),
    ).withColumn("err_cents", F.col("est_cents") - F.col("exact_cents"))


QUERIES["quantile_sketch"] = q_quantile_sketch

ORACLES["quantile_sketch"] = f"""
    WITH base AS (
        SELECT event_type, round(value * 100)::BIGINT AS c FROM events
    ),
    stats AS (
        SELECT event_type, min(c) AS mn, max(c) AS mx,
               count(*)::BIGINT AS n, list_sort(list(c)) AS vals,
               (max(c) - min(c)) // {QSK_NB} + 1 AS w
        FROM base GROUP BY event_type
    ),
    hist AS (
        SELECT base.event_type AS event_type,
               least({QSK_NB - 1}, (c - mn) // w) AS bucket,
               count(*) AS bn
        FROM base JOIN stats ON base.event_type = stats.event_type
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, bucket, sum(bn) OVER (
            PARTITION BY event_type ORDER BY bucket
            ROWS UNBOUNDED PRECEDING) AS cum
        FROM hist
    ),
    agg AS (
        SELECT c.event_type,
               min(CASE WHEN cum >= (1*n + 1) // 2 THEN bucket END) AS b50,
               min(CASE WHEN cum >= (9*n + 9) // 10 THEN bucket END) AS b90,
               min(CASE WHEN cum >= (99*n + 99) // 100 THEN bucket END) AS b99
        FROM cum c JOIN stats s ON c.event_type = s.event_type
        GROUP BY 1
    ),
    wide AS (
        SELECT s.event_type, w,
               least(mx, mn + (b50 + 1) * w) AS e50,
               vals[((1*n + 1) // 2)::INT] AS x50,
               least(mx, mn + (b90 + 1) * w) AS e90,
               vals[((9*n + 9) // 10)::INT] AS x90,
               least(mx, mn + (b99 + 1) * w) AS e99,
               vals[((99*n + 99) // 100)::INT] AS x99
        FROM agg a JOIN stats s ON a.event_type = s.event_type
    )
    SELECT event_type, w, p, est_cents, exact_cents,
           est_cents - exact_cents AS err_cents
    FROM (
        SELECT event_type, w, 0.5::DOUBLE AS p, e50 AS est_cents, x50 AS exact_cents FROM wide
        UNION ALL
        SELECT event_type, w, 0.9::DOUBLE, e90, x90 FROM wide
        UNION ALL
        SELECT event_type, w, 0.99::DOUBLE, e99, x99 FROM wide
    )
"""


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection per event type: median absolute
    deviation (MAD) with a 3×MAD outlier rule — the standard robust
    alternative to z-scores (one wild value shifts a mean/stddev but
    not a median). Both medians use the exact discrete formula shared
    with q_percentiles (element ceil(n/2) of the sorted values, integer
    cents) so the oracle is bit-comparable; the deviation pass is a
    broadcast join of the 5-row median table followed by map-side
    |c - med|. Production swaps the sorted-array exact medians for
    approx_percentile sketches — the outlier count join shape is
    unchanged."""
    ev = table(spark, sf_dir, "events", spread=True)
    base = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("c")
    )
    med_idx = F.expr("cast((n + 1) div 2 as int)")
    med = (
        base.groupBy("event_type")
        .agg(
            F.sort_array(F.collect_list("c")).alias("vals"),
            F.count("*").alias("n"),
        )
        .select(
            "event_type", "n",
            F.element_at(F.col("vals"), med_idx).alias("med"),
        )
    )
    dev = base.join(F.broadcast(med), "event_type").select(
        "event_type", "n", "med", F.abs(F.col("c") - F.col("med")).alias("d")
    )
    mad = (
        dev.groupBy("event_type")
        .agg(F.sort_array(F.collect_list("d")).alias("dv"))
        .join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            F.element_at(F.col("dv"), med_idx).alias("mad"),
        )
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value(F.col("med")).alias("med_cents"),
            F.any_value(F.col("mad")).alias("mad_cents"),
            F.sum((F.col("d") > 3 * F.col("mad")).cast("long")).alias("n_outliers"),
            F.count("*").alias("n"),
        )
    )


QUERIES["mad_outliers"] = q_mad_outliers

ORACLES["mad_outliers"] = """
    WITH base AS (
        SELECT event_type, round(value * 100)::BIGINT AS c FROM events
    ),
    med AS (
        SELECT event_type, count(*)::BIGINT AS n,
               (list_sort(list(c)))[((count(*) + 1) // 2)::INT] AS med
        FROM base GROUP BY event_type
    ),
    dev AS (
        SELECT base.event_type AS event_type, n, med, abs(c - med) AS d
        FROM base JOIN med ON base.event_type = med.event_type
    ),
    mad AS (
        SELECT event_type,
               (list_sort(list(d)))[((count(*) + 1) // 2)::INT] AS mad
        FROM dev GROUP BY event_type
    )
    SELECT dev.event_type AS event_type,
           any_value(med) AS med_cents, any_value(mad.mad) AS mad_cents,
           sum(CASE WHEN d > 3 * mad.mad THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
           count(*)::BIGINT AS n
    FROM dev JOIN mad ON dev.event_type = mad.event_type
    GROUP BY 1
"""


def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability proof for the HLL sketch — the property that makes
    it the 100 TB distinct-count: registers built over DISJOINT ingest
    batches (here the event_id-parity halves) and max-merged must equal
    the registers built over the whole corpus in one pass, so per-batch
    sketches roll up across days/partitions/clusters without rescanning
    history. Emits both estimates (merged-halves vs whole-pass, same
    formula as ``q_hll_distinct``) and the register-table diff count
    (full outer join on (type, bucket)) — zero by construction, and the
    oracle recomputes all of it from scratch. Shuffle: three bounded
    register aggregates (≤64 rows per type each) + one register-sized
    outer join; nothing scales with user cardinality."""
    e = table(spark, sf_dir, "events")

    def regs(df):
        h = hex32(F.concat(F.lit("hll|"), F.col("user_id").cast("string")))
        hashed = df.select(
            "event_type",
            (h % HLL_M).alias("bucket"),
            F.floor(h / HLL_M).cast("long").alias("w"),
        ).select(
            "event_type", "bucket",
            F.when(F.col("w") == 0, F.lit(27))
            .otherwise(F.lit(27) - F.length(F.conv(F.col("w"), 10, 2)))
            .cast("int")
            .alias("rho"),
        )
        return hashed.groupBy("event_type", "bucket").agg(
            F.max("rho").alias("m")
        )

    def estimate(r, out):
        per = r.groupBy("event_type").agg(
            F.count("*").alias("npresent"),
            F.sum(F.expr("shiftleft(1L, cast(27 - m as int))")).alias("s"),
        )
        T = F.col("s") + (F.lit(HLL_M) - F.col("npresent")) * F.lit(1 << 27)
        raw = F.lit(0.709) * F.lit(float(HLL_M * HLL_M * (1 << 27))) / T
        V = F.lit(HLL_M) - F.col("npresent")
        est = (
            F.when(
                (raw <= F.lit(2.5 * HLL_M)) & (V > 0),
                F.round(F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / V), 2),
            )
            .otherwise(F.round(raw, 2))
            .alias(out)
        )
        return per.select("event_type", est)

    half_a = regs(e.filter(F.col("event_id") % 2 == 0))
    half_b = regs(e.filter(F.col("event_id") % 2 == 1))
    merged = (
        half_a.unionByName(half_b)
        .groupBy("event_type", "bucket")
        .agg(F.max("m").alias("m"))
    )
    whole = regs(e)
    diff = (
        merged.select("event_type", "bucket", F.col("m").alias("ma"))
        .join(
            whole.select("event_type", "bucket", F.col("m").alias("mb")),
            ["event_type", "bucket"],
            "full_outer",
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                (
                    F.col("ma").isNull()
                    | F.col("mb").isNull()
                    | (F.col("ma") != F.col("mb"))
                ).cast("long")
            ).alias("n_reg_diff")
        )
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return (
        estimate(merged, "est_merged")
        .join(estimate(whole, "est_whole"), "event_type")
        .join(diff, "event_type")
        .join(exact, "event_type")
        .select("event_type", "est_merged", "est_whole", "n_reg_diff",
                F.col("n_exact").cast("long").alias("n_exact"))
    )


QUERIES["hll_merge"] = q_hll_merge

_HLL_REGS = f"""
        SELECT event_type, ({_HLL_H}) % 64 AS bucket,
               max(CASE WHEN ({_HLL_H}) // 64 = 0 THEN 27
                        ELSE 27 - length(bin(({_HLL_H}) // 64)) END) AS m
        FROM {{src}} GROUP BY 1, 2
"""

_HLL_EST = """
        SELECT event_type,
               CASE WHEN (0.709 * 549755813888.0
                          / (s + (64 - npresent) * 134217728)) <= 160.0
                         AND (64 - npresent) > 0
                    THEN round(64.0 * ln(64.0 / (64 - npresent)), 2)
                    ELSE round(0.709 * 549755813888.0
                               / (s + (64 - npresent) * 134217728), 2)
               END AS {out}
        FROM (
            SELECT event_type, count(*) AS npresent,
                   sum(1::BIGINT << CAST(27 - m AS INT)) AS s
            FROM {src} GROUP BY event_type
        )
"""

ORACLES["hll_merge"] = f"""
    WITH ea AS (SELECT * FROM events WHERE event_id % 2 = 0),
    eb AS (SELECT * FROM events WHERE event_id % 2 = 1),
    ra AS ({_HLL_REGS.format(src='ea')}),
    rb AS ({_HLL_REGS.format(src='eb')}),
    merged AS (
        SELECT event_type, bucket, max(m) AS m
        FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb)
        GROUP BY 1, 2
    ),
    whole AS ({_HLL_REGS.format(src='events')}),
    em AS ({_HLL_EST.format(src='merged', out='est_merged')}),
    ew AS ({_HLL_EST.format(src='whole', out='est_whole')}),
    diff AS (
        SELECT coalesce(a.event_type, b.event_type) AS event_type,
               sum(CASE WHEN a.m IS NULL OR b.m IS NULL OR a.m <> b.m
                        THEN 1 ELSE 0 END)::BIGINT AS n_reg_diff
        FROM merged a FULL OUTER JOIN whole b
          ON a.event_type = b.event_type AND a.bucket = b.bucket
        GROUP BY 1
    ),
    ex AS (
        SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact
        FROM events GROUP BY 1
    )
    SELECT event_type, em.est_merged, ew.est_whole, diff.n_reg_diff,
           ex.n_exact
    FROM em JOIN ew USING (event_type) JOIN diff USING (event_type)
    JOIN ex USING (event_type)
"""
