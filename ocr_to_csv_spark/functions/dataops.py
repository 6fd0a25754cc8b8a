"""Data-ops operators, batch 7: constraint auditing (the Deequ /
Delta-expectations shape) and ingest-drift detection.

Scale design (100 TB):
- ``dq_audit`` validates a rule set against a table and reports exact
  violation counts per rule. Every row-local rule (null, range,
  uniqueness-by-count-distinct) folds into ONE partial+final aggregate
  — a single scan, one 1-row shuffle — and the referential rule is one
  broadcast anti-join against the dimension's key column. This is the
  gate a production ingest runs before committing a snapshot: rules are
  data, the plan does not grow with the corpus, and nothing row-sized
  reaches the driver.
- ``source_drift`` is distribution-drift monitoring between two ingest
  halves (yesterday-vs-today, crawlA-vs-crawlB): token frequencies per
  half for the corpus's top tokens, with share ratios and L1 drift
  contributions. One (half, token) aggregate (partial map-side,
  cardinality ≤ 2×|vocab|), the top-token table broadcasts back, all
  ratios are fixed-parenthesization IEEE divisions of exact int64
  counts — bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import DUCK_HEX32, DUCK_TOKENS, hex32, table, tokens

VALUE_LO, VALUE_HI = 0.0, 250.0  # expected value band for the range rule
DRIFT_TOP = 20  # top-N corpus tokens monitored for drift


def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit over events: exact violation counts for four
    rules — null key, value out of expected band, duplicate event_id,
    and user_id orphaned from the customer dimension. Row-local rules
    share ONE aggregate pass; the referential rule is one broadcast
    anti-join."""
    e = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer")
    local = e.agg(
        F.count("*").alias("n"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("v_null"),
        F.sum(
            (
                (F.col("value") < VALUE_LO) | (F.col("value") > VALUE_HI)
            ).cast("long")
        ).alias("v_range"),
        (F.count("*") - F.count_distinct("event_id")).alias("v_dup"),
    )
    orphans = (
        e.join(
            F.broadcast(c.select(F.col("c_custkey").alias("user_id"))),
            "user_id",
            "left_anti",
        ).agg(F.count("*").alias("v_orphan"))
    )
    one = local.crossJoin(orphans)
    rules = F.array(
        F.struct(
            F.lit("null_user_id").alias("rule"),
            F.col("v_null").alias("n_violations"),
        ),
        F.struct(
            F.lit("value_out_of_range").alias("rule"),
            F.col("v_range").alias("n_violations"),
        ),
        F.struct(
            F.lit("duplicate_event_id").alias("rule"),
            F.col("v_dup").alias("n_violations"),
        ),
        F.struct(
            F.lit("orphan_user_id").alias("rule"),
            F.col("v_orphan").alias("n_violations"),
        ),
    )
    out = one.select(F.col("n"), F.explode(rules).alias("r"))
    return out.select(
        F.col("r.rule").alias("rule"),
        F.col("r.n_violations").alias("n_violations"),
        F.col("n").alias("n_checked"),
        (
            F.col("r.n_violations").cast("double")
            / F.col("n").cast("double")
        ).alias("violation_rate"),
    )


def q_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-drift report: split the corpus into two halves by source
    hash (the yesterday-vs-today shape), count each of the corpus's top
    tokens in both halves, and report per-token shares, the A/B share
    ratio and the |share_a - share_b| L1 drift contribution."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        (hex32(F.col("source")) % 2).alias("half"),
        F.explode(tokens(F.col("text"))).alias("tok"),
    )
    counts = tok.groupBy("half", "tok").agg(F.count("*").alias("c"))
    top = (
        tok.groupBy("tok")
        .agg(F.count("*").alias("ct"))
        .orderBy(F.desc("ct"), F.asc("tok"))
        .limit(DRIFT_TOP)
        .select("tok")
    )
    cells = counts.join(F.broadcast(top), "tok")
    a = cells.where("half = 0").select("tok", F.col("c").alias("n_a"))
    b = cells.where("half = 1").select("tok", F.col("c").alias("n_b"))
    wide = (
        a.join(b, "tok", "full")
        .select(
            "tok",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    tot = wide.agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    out = wide.crossJoin(F.broadcast(tot)).select(
        "tok",
        "n_a",
        "n_b",
        (F.col("n_a").cast("double") / F.col("t_a").cast("double")).alias(
            "share_a"
        ),
        (F.col("n_b").cast("double") / F.col("t_b").cast("double")).alias(
            "share_b"
        ),
    )
    return out.select(
        "tok",
        "n_a",
        "n_b",
        "share_a",
        "share_b",
        F.abs(F.col("share_a") - F.col("share_b")).alias("l1_drift"),
    )


SPLIT_BUCKETS = 10  # buckets 0-7 train, 8 val, 9 test (80/10/10)


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic, leakage-safe train/val/test split assignment. The
    split key is a 32-bit hash of the NORMALIZED CONTENT, not the row
    id, so byte-identical duplicates can never straddle splits — the
    standard guard against test-set contamination through duplicate
    leakage (near-dups are handled upstream by the dedup layer). The
    assignment is pure map-side arithmetic: no sampling state, no
    shuffle, reproducible across runs, engines and cluster sizes — at
    100 TB every executor assigns its own partition independently and a
    re-crawled identical document lands in the same split forever."""
    d = table(spark, sf_dir, "documents", spread=True)
    b = hex32(F.lower(F.col("text"))) % SPLIT_BUCKETS
    return d.select(
        "doc_id",
        "lang",
        b.alias("bucket"),
        F.when(b <= 7, "train")
        .when(b == 8, "val")
        .otherwise("test")
        .alias("split"),
    )




TD_BUCKETS = 64
TD_MUT = 97   # replica corruption: text perturbed where doc_id % 97 == 3
TD_DROP = 101  # replica loss: row missing where doc_id % 101 == 7


def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum-based table reconciliation (the data-diff idiom): to
    verify a 100 TB replica you never sort-merge both copies — each
    side aggregates (row count, sum of row hashes) into 64 key-hash
    buckets, the bucket summaries join (tiny), and ONLY the buckets
    whose checksums disagree get re-read at row grain to name the
    differing keys. Here the "replica" is derived deterministically
    from documents (text perturbed on one residue class, rows dropped
    on another) so the oracle can replicate it; the plan is the real
    one — two map-side bucket aggregates, a 64-row join, then row-grain
    work confined to mismatched buckets via an equi semi-join on the
    bucket id. Emits one row per differing doc_id with its status."""
    d = table(spark, sf_dir, "documents")
    src = d.select("doc_id", "text")
    rep = (
        d.filter(F.col("doc_id") % TD_DROP != 7)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % TD_MUT == 3,
                F.concat(F.col("text"), F.lit(" CORRUPTED")),
            ).otherwise(F.col("text")).alias("text"),
        )
    )

    def summarize(t: DataFrame, side: str) -> DataFrame:
        rh = hex32(F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("text")))
        b = F.pmod(hex32(F.col("doc_id").cast("string")), F.lit(TD_BUCKETS))
        return (
            t.select(b.alias("b"), rh.alias("rh"))
            .groupBy("b")
            .agg(F.count("*").alias(f"cnt_{side}"), F.sum("rh").alias(f"sum_{side}"))
        )
    sa = summarize(src, "a")
    sb = summarize(rep, "b")
    bad = (
        sa.join(sb, "b", "full")
        .filter(
            (F.col("cnt_a").isNull() | F.col("cnt_b").isNull())
            | (F.col("cnt_a") != F.col("cnt_b"))
            | (F.col("sum_a") != F.col("sum_b"))
        )
        .select("b")
    )
    bcol = F.pmod(hex32(F.col("doc_id").cast("string")), F.lit(TD_BUCKETS)).alias("b")
    rha = hex32(F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("text")))
    left = src.select("doc_id", bcol, rha.alias("ha")).join(bad, "b", "semi")
    right = rep.select("doc_id", bcol, rha.alias("hb")).join(bad, "b", "semi")
    j = left.join(right.select("doc_id", "hb"), "doc_id", "full")
    return (
        j.filter(F.col("ha").isNull() | F.col("hb").isNull() | (F.col("ha") != F.col("hb")))
        .select(
            "doc_id",
            F.when(F.col("hb").isNull(), F.lit("missing_in_replica"))
            .when(F.col("ha").isNull(), F.lit("extra_in_replica"))
            .otherwise(F.lit("changed"))
            .alias("status"),
        )
    )




K_ANON = 4  # groups smaller than this violate k-anonymity
K_ANON_BAND = 1000  # acctbal quasi-identifier band width (dollars*100)


def q_k_anon_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (data-governance gate next to ``dq_audit`` /
    ``pii_scrub``): under the quasi-identifier tuple (nation, market
    segment, account-balance band), any equivalence class smaller than
    k re-identifies its members; the audit emits every violating class
    with its size. ONE map-side aggregate over the quasi-identifier
    key — at 10^12 rows the violating classes are by definition the
    SMALL groups, so the output is tiny and the release decision
    (suppress / generalize the band) reads straight off it."""
    c = table(spark, sf_dir, "customer")
    band = F.floor(F.round(F.col("c_acctbal") * 100) / K_ANON_BAND).cast("long")
    return (
        c.groupBy(
            F.col("c_nationkey").cast("long").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            band.alias("bal_band"),
        )
        .agg(F.count("*").alias("class_size"))
        .filter(F.col("class_size") < K_ANON)
    )


def q_consistent_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-preserving UNIVERSE sampling (BlinkDB / quickstep idiom):
    sampling each table independently destroys joins (P(keep pair) =
    p²); sampling the JOIN KEY's hash universe keeps every row of both
    sides for the sampled keys, so per-key joins survive intact and
    join aggregates scale by 1/p unbiased. Emits the audit: exact join
    count, universe-sample estimate (count/p on the key-sampled join),
    and the estimator bias — all deterministic (hash sampling, no
    RNG; at 10^12 rows the universe sample is the only way a join
    aggregate survives sampling)."""
    p_mod, p_keep = 10, 1  # keep keys with hash % 10 == 0 (p = 1/10)
    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey")
    keyhash = lambda c: F.pmod(hex32(F.col(c).cast("string")), F.lit(p_mod))
    exact = li.join(o, li.l_orderkey == o.o_orderkey).agg(
        F.count("*").alias("exact_join_rows")
    )
    uni = (
        li.filter(keyhash("l_orderkey") < p_keep)
        .join(
            o.filter(keyhash("o_orderkey") < p_keep),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .agg((F.count("*") * p_mod).alias("universe_est_rows"))
    )
    return exact.crossJoin(uni).select(
        "exact_join_rows",
        "universe_est_rows",
        (F.col("universe_est_rows") - F.col("exact_join_rows")).alias("bias_rows"),
    )


QUERIES = {
    "k_anon_audit": q_k_anon_audit,
    "consistent_sample": q_consistent_sample,
    "table_diff": q_table_diff,
    "dq_audit": q_dq_audit,
    "source_drift": q_source_drift,
    "split_assign": q_split_assign,
}

_TOKS = DUCK_TOKENS.format(x="text")
_H = DUCK_HEX32.format(x="source")

ORACLES = {}

ORACLES["dq_audit"] = f"""
    WITH local AS (
        SELECT count(*)::BIGINT AS n,
               count(*) FILTER (user_id IS NULL)::BIGINT AS v_null,
               count(*) FILTER (
                   value < {VALUE_LO} OR value > {VALUE_HI}
               )::BIGINT AS v_range,
               (count(*) - count(DISTINCT event_id))::BIGINT AS v_dup
        FROM events
    ),
    orph AS (
        SELECT count(*)::BIGINT AS v_orphan
        FROM events e
        WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id
        )
    ),
    rules AS (
        SELECT 'null_user_id' AS rule, v_null AS n_violations, n
        FROM local
        UNION ALL
        SELECT 'value_out_of_range', v_range, n FROM local
        UNION ALL
        SELECT 'duplicate_event_id', v_dup, n FROM local
        UNION ALL
        SELECT 'orphan_user_id', v_orphan, n FROM local, orph
    )
    SELECT rule, n_violations, n AS n_checked,
           (CAST(n_violations AS DOUBLE) / CAST(n AS DOUBLE))
               AS violation_rate
    FROM rules
"""

ORACLES["split_assign"] = f"""
    SELECT doc_id, lang, bucket,
           CASE WHEN bucket <= 7 THEN 'train'
                WHEN bucket = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id, lang,
               ({DUCK_HEX32.format(x="lower(text)")} % {SPLIT_BUCKETS})
                   AS bucket
        FROM documents
    )
"""

ORACLES["source_drift"] = f"""
    WITH tok AS (
        SELECT ({_H} % 2) AS half, unnest({_TOKS}) AS tok
        FROM documents
    ),
    counts AS (
        SELECT half, tok, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2
    ),
    top AS (
        SELECT tok FROM tok GROUP BY tok
        ORDER BY count(*) DESC, tok ASC LIMIT {DRIFT_TOP}
    ),
    wide AS (
        SELECT t.tok,
               coalesce(a.c, 0)::BIGINT AS n_a,
               coalesce(b.c, 0)::BIGINT AS n_b
        FROM top t
        LEFT JOIN (SELECT tok, c FROM counts WHERE half = 0) a
               ON t.tok = a.tok
        LEFT JOIN (SELECT tok, c FROM counts WHERE half = 1) b
               ON t.tok = b.tok
    ),
    tot AS (
        SELECT sum(n_a)::BIGINT AS t_a, sum(n_b)::BIGINT AS t_b FROM wide
    )
    SELECT tok, n_a, n_b,
           (CAST(n_a AS DOUBLE) / CAST(t_a AS DOUBLE)) AS share_a,
           (CAST(n_b AS DOUBLE) / CAST(t_b AS DOUBLE)) AS share_b,
           abs((CAST(n_a AS DOUBLE) / CAST(t_a AS DOUBLE))
               - (CAST(n_b AS DOUBLE) / CAST(t_b AS DOUBLE))) AS l1_drift
    FROM wide, tot
"""

ORACLES["table_diff"] = f"""
    WITH src AS (SELECT doc_id, text FROM documents),
    rep AS (
        SELECT doc_id,
               CASE WHEN doc_id % {TD_MUT} = 3 THEN text || ' CORRUPTED'
                    ELSE text END AS text
        FROM documents WHERE doc_id % {TD_DROP} != 7
    ),
    sa AS (
        SELECT {DUCK_HEX32.format(x="CAST(doc_id AS VARCHAR)")} % {TD_BUCKETS} AS b,
               count(*) AS cnt_a,
               CAST(sum({DUCK_HEX32.format(x="CAST(doc_id AS VARCHAR) || '|' || text")}) AS BIGINT) AS sum_a
        FROM src GROUP BY 1
    ),
    sb AS (
        SELECT {DUCK_HEX32.format(x="CAST(doc_id AS VARCHAR)")} % {TD_BUCKETS} AS b,
               count(*) AS cnt_b,
               CAST(sum({DUCK_HEX32.format(x="CAST(doc_id AS VARCHAR) || '|' || text")}) AS BIGINT) AS sum_b
        FROM rep GROUP BY 1
    ),
    bad AS (
        SELECT coalesce(sa.b, sb.b) AS b
        FROM sa FULL JOIN sb ON sa.b = sb.b
        WHERE sa.cnt_a IS NULL OR sb.cnt_b IS NULL
           OR sa.cnt_a != sb.cnt_b OR sa.sum_a != sb.sum_b
    ),
    l AS (
        SELECT doc_id,
               {DUCK_HEX32.format(x="CAST(doc_id AS VARCHAR) || '|' || text")} AS ha
        FROM src
        WHERE {DUCK_HEX32.format(x="CAST(doc_id AS VARCHAR)")} % {TD_BUCKETS}
              IN (SELECT b FROM bad)
    ),
    r AS (
        SELECT doc_id,
               {DUCK_HEX32.format(x="CAST(doc_id AS VARCHAR) || '|' || text")} AS hb
        FROM rep
        WHERE {DUCK_HEX32.format(x="CAST(doc_id AS VARCHAR)")} % {TD_BUCKETS}
              IN (SELECT b FROM bad)
    )
    SELECT coalesce(l.doc_id, r.doc_id) AS doc_id,
           CASE WHEN r.hb IS NULL THEN 'missing_in_replica'
                WHEN l.ha IS NULL THEN 'extra_in_replica'
                ELSE 'changed' END AS status
    FROM l FULL JOIN r ON l.doc_id = r.doc_id
    WHERE l.ha IS NULL OR r.hb IS NULL OR l.ha != r.hb
"""

ORACLES["k_anon_audit"] = f"""
    SELECT CAST(c_nationkey AS BIGINT) AS nation,
           c_mktsegment AS segment,
           CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT) / {K_ANON_BAND}.0)
                AS BIGINT) AS bal_band,
           count(*) AS class_size
    FROM customer
    GROUP BY 1, 2, 3
    HAVING count(*) < {K_ANON}
"""

ORACLES["consistent_sample"] = f"""
    WITH ex AS (
        SELECT count(*) AS exact_join_rows
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    uni AS (
        SELECT CAST(count(*) * 10 AS BIGINT) AS universe_est_rows
        FROM (SELECT l_orderkey FROM lineitem
              WHERE {DUCK_HEX32.format(x="CAST(l_orderkey AS VARCHAR)")} % 10 < 1) l
        JOIN (SELECT o_orderkey FROM orders
              WHERE {DUCK_HEX32.format(x="CAST(o_orderkey AS VARCHAR)")} % 10 < 1) o
          ON l.l_orderkey = o.o_orderkey
    )
    SELECT exact_join_rows, universe_est_rows,
           CAST(universe_est_rows - exact_join_rows AS BIGINT) AS bias_rows
    FROM ex, uni
"""

