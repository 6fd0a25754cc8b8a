"""Advanced analytics, batch 24: KMV/theta distinct-intersection
sketches, Fellegi–Sunter record-linkage scoring, and distributed
covariance accumulation (the PCA input) over the embedding table.

Scale design (100 TB):
- ``theta_intersect`` (KMV / theta sketch): HLL (``hll_distinct``) can
  union but NOT intersect; a K-minimum-values sketch supports both.
  Only the K smallest user-hashes per event type ever leave the events
  table — the per-type sketch is K rows regardless of cardinality, via
  a rank window that Spark plans as WindowGroupLimit (per-partition
  top-K pushdown before the shuffle). All pair estimation then runs on
  sketch-sized data (K·|types| rows): union sketch = K smallest of the
  two sketches' union, θ = h_K/2³², |A∪B| ≈ (K−1)·2³²/h_K, and
  |A∩B| ≈ J·|A∪B| with J = |common members in the union sketch|/K.
  The exact intersection is emitted alongside as an audit column (it
  is cheap HERE; at 10¹² rows only the sketch path survives).
- ``record_linkage`` (Fellegi–Sunter): candidate pairs come ONLY from
  a blocking equi-join on (lang, length-bucket) — the quadratic scan
  is confined to a block, exactly like LSH banding confines near-dup.
  Field-agreement log-odds weights (match/non-match in integer
  milli-nats, the classic m/u formulation) are FIXED constants, so the
  score is an exact int64 sum; the decision thresholds compare
  integers. Skewed blocks at scale: salt the bucket or cap block size
  (documented; the length-bucket granularity already bounds blocks).
- ``pca_cov``: the d×d covariance accumulation that feeds an
  embedding-decorrelation / PCA step. ``mapInPandas`` computes ONE
  integer Gram-matrix update per Arrow batch (X.T @ X as a single
  numpy matmul — never a per-row loop), emitting d(d+1)/2 + d + 1
  partial rows per batch; only those cross the shuffle for the final
  sum. Values are quantized to q = round(x·1024) so partial sums are
  exact int64 and engine-independent (|q|≤2¹⁰·√d ⇒ products ≤2²⁶;
  overflow headroom to ~2³⁷ rows per partial — at larger scale the
  partials tier through a second aggregate level, same plan shape).
  The driver-side d×d eigensolve on the returned 2080 covariance cells
  is O(d³) and independent of N.

Reference parity: the reference has no analytics layer; these extend
SURVEY.md §2 A-family aggregations the same way ``analytics.py`` does.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .util import DUCK_HEX32, hex32, table

KMV_K = 64
THETA_SPACE = 1 << 32

FS_WEIGHTS = {  # field -> (agree milli-nats, disagree milli-nats)
    "source": (2200, -800),
    "tokens": (1500, -500),
    "prefix": (3000, -100),
}
FS_CHAR_BUCKET = 32  # blocking: n_chars // bucket
FS_TOK_TOL = 1  # |token-count delta| <= tol counts as agreement
FS_THRESHOLD = 1000  # milli-nats; score > threshold => link
FS_PREFIX = 12  # chars of prefix compared exactly

PCA_SCALE = 1024  # value quantization: q = round(x * PCA_SCALE)


def q_theta_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user intersection estimates for every event-type pair
    from K-minimum-values sketches (plus the exact intersection as an
    audit column)."""
    ev = table(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    h = hex32(F.col("user_id").cast("string")).alias("h")
    hashed = ev.select("event_type", "user_id", h)
    w = Window.partitionBy("event_type").orderBy(F.col("h").asc(), F.col("user_id").asc())
    sk = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .select("event_type", "h")
        .distinct()
    )
    a = sk.select(F.col("event_type").alias("type_a"), F.col("h").alias("ha"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("h").alias("hb"))
    # union-of-sketches per pair: tag membership, rank, keep K smallest
    pairs = (
        a.select("type_a").distinct()
        .join(b.select("type_b").distinct(), F.col("type_a") < F.col("type_b"))
    )
    mem = (
        pairs.join(a, "type_a")
        .join(
            b.withColumnRenamed("hb", "h_b_side"), "type_b"
        )
        .filter(F.col("ha") == F.col("h_b_side"))
        .select("type_a", "type_b", F.col("ha").alias("h"), F.lit(1).alias("in_both"))
    )
    union_rows = (
        pairs.join(a, "type_a").select("type_a", "type_b", F.col("ha").alias("h"))
        .union(pairs.join(b, "type_b").select("type_a", "type_b", F.col("hb").alias("h")))
        .distinct()
        .join(mem.select("type_a", "type_b", "h", "in_both"), ["type_a", "type_b", "h"], "left")
        .na.fill({"in_both": 0})
    )
    wu = Window.partitionBy("type_a", "type_b").orderBy(F.col("h").asc())
    topk = union_rows.withColumn("rn", F.row_number().over(wu)).filter(
        F.col("rn") <= KMV_K
    )
    est = (
        topk.groupBy("type_a", "type_b")
        .agg(
            F.max("h").alias("h_k"),
            F.sum("in_both").alias("n_both"),
            F.count("*").alias("k_used"),
        )
        .select(
            "type_a",
            "type_b",
            "h_k",
            "n_both",
            "k_used",
            (
                ((F.col("k_used") - 1) * F.lit(float(THETA_SPACE))) / F.col("h_k")
            ).alias("est_union"),
            (
                (F.col("n_both") / F.col("k_used"))
                * (((F.col("k_used") - 1) * F.lit(float(THETA_SPACE))) / F.col("h_k"))
            ).alias("est_inter"),
        )
    )
    # exact intersection audit (cheap at test scale; sketch path is the
    # 10^12-row answer)
    ex = (
        ev.alias("x")
        .join(ev.alias("y"), F.col("x.user_id") == F.col("y.user_id"))
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("exact_inter"))
    )
    return est.join(ex, ["type_a", "type_b"], "left").na.fill({"exact_inter": 0})


_THETA_SQL = f"""
    WITH ev AS (
        SELECT DISTINCT event_type, user_id FROM events
    ), hashed AS (
        SELECT event_type, user_id,
               {DUCK_HEX32.format(x="CAST(user_id AS VARCHAR)")} AS h
        FROM ev
    ), sk AS (
        SELECT DISTINCT event_type, h FROM (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY h ASC, user_id ASC) AS rn
            FROM hashed
        ) WHERE rn <= {KMV_K}
    ), pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b
        FROM (SELECT DISTINCT event_type FROM sk) a,
             (SELECT DISTINCT event_type FROM sk) b
        WHERE a.event_type < b.event_type
    ), union_rows AS (
        SELECT p.type_a, p.type_b, u.h,
               CASE WHEN EXISTS (
                   SELECT 1 FROM sk sa, sk sb
                   WHERE sa.event_type = p.type_a AND sb.event_type = p.type_b
                     AND sa.h = u.h AND sb.h = u.h
               ) THEN 1 ELSE 0 END AS in_both
        FROM pairs p
        JOIN (
            SELECT DISTINCT type_a, type_b, h FROM (
                SELECT p2.type_a, p2.type_b, s.h
                FROM pairs p2 JOIN sk s ON s.event_type = p2.type_a
                UNION ALL
                SELECT p2.type_a, p2.type_b, s.h
                FROM pairs p2 JOIN sk s ON s.event_type = p2.type_b
            )
        ) u ON u.type_a = p.type_a AND u.type_b = p.type_b
    ), topk AS (
        SELECT * FROM (
            SELECT type_a, type_b, h, in_both,
                   row_number() OVER (PARTITION BY type_a, type_b
                                      ORDER BY h ASC) AS rn
            FROM union_rows
        ) WHERE rn <= {KMV_K}
    ), est AS (
        SELECT type_a, type_b,
               CAST(max(h) AS BIGINT) AS h_k,
               CAST(sum(in_both) AS BIGINT) AS n_both,
               count(*) AS k_used
        FROM topk GROUP BY type_a, type_b
    ), ex AS (
        SELECT x.event_type AS type_a, y.event_type AS type_b,
               count(*) AS exact_inter
        FROM ev x JOIN ev y ON x.user_id = y.user_id
        WHERE x.event_type < y.event_type
        GROUP BY 1, 2
    )
    SELECT est.type_a, est.type_b, est.h_k, est.n_both, est.k_used,
           ((est.k_used - 1) * {float(THETA_SPACE)}) / est.h_k AS est_union,
           (CAST(est.n_both AS DOUBLE) / est.k_used)
             * (((est.k_used - 1) * {float(THETA_SPACE)}) / est.h_k) AS est_inter,
           coalesce(ex.exact_inter, 0) AS exact_inter
    FROM est LEFT JOIN ex
      ON est.type_a = ex.type_a AND est.type_b = ex.type_b
"""


def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter linkage between the two halves of the documents
    table (split by doc_id hash parity): blocking equi-join on
    (lang, length bucket), integer log-odds agreement scoring, links
    above the decision threshold."""
    d = table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " ")).alias("n_tok")
    recs = d.select(
        "doc_id",
        "lang",
        "source",
        toks,
        F.expr(f"n_chars div {FS_CHAR_BUCKET}").alias("len_bucket"),
        F.substring("text", 1, FS_PREFIX).alias("prefix"),
        F.pmod(hex32(F.col("doc_id").cast("string")), F.lit(2)).alias("half"),
    )
    left = recs.filter(F.col("half") == 0)
    right = recs.filter(F.col("half") == 1)
    j = left.alias("l").join(
        right.alias("r"),
        (F.col("l.lang") == F.col("r.lang"))
        & (F.col("l.len_bucket") == F.col("r.len_bucket")),
    )

    def w(field: str, agree: F.Column) -> F.Column:
        a, dis = FS_WEIGHTS[field]
        return F.when(agree, F.lit(a)).otherwise(F.lit(dis))

    scored = j.select(
        F.col("l.doc_id").alias("doc_a"),
        F.col("r.doc_id").alias("doc_b"),
        (
            w("source", F.col("l.source") == F.col("r.source"))
            + w(
                "tokens",
                F.abs(F.col("l.n_tok") - F.col("r.n_tok")) <= FS_TOK_TOL,
            )
            + w("prefix", F.col("l.prefix") == F.col("r.prefix"))
        ).alias("score"),
        (F.col("l.source") == F.col("r.source")).cast("int").alias("agr_source"),
        (F.abs(F.col("l.n_tok") - F.col("r.n_tok")) <= FS_TOK_TOL)
        .cast("int")
        .alias("agr_tokens"),
        (F.col("l.prefix") == F.col("r.prefix")).cast("int").alias("agr_prefix"),
    )
    return scored.filter(F.col("score") > FS_THRESHOLD)


_FS_W = FS_WEIGHTS
_FS_SQL = f"""
    WITH recs AS (
        SELECT doc_id, lang, source,
               len(string_split(text, ' ')) AS n_tok,
               n_chars // {FS_CHAR_BUCKET} AS len_bucket,
               substr(text, 1, {FS_PREFIX}) AS prefix,
               {DUCK_HEX32.format(x="CAST(doc_id AS VARCHAR)")} % 2 AS half
        FROM documents
    )
    SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
           CAST((CASE WHEN l.source = r.source
                 THEN {_FS_W['source'][0]} ELSE {_FS_W['source'][1]} END)
           + (CASE WHEN abs(l.n_tok - r.n_tok) <= {FS_TOK_TOL}
                 THEN {_FS_W['tokens'][0]} ELSE {_FS_W['tokens'][1]} END)
           + (CASE WHEN l.prefix = r.prefix
                 THEN {_FS_W['prefix'][0]} ELSE {_FS_W['prefix'][1]} END) AS BIGINT)
             AS score,
           (l.source = r.source)::INT AS agr_source,
           (abs(l.n_tok - r.n_tok) <= {FS_TOK_TOL})::INT AS agr_tokens,
           (l.prefix = r.prefix)::INT AS agr_prefix
    FROM recs l JOIN recs r
      ON l.lang = r.lang AND l.len_bucket = r.len_bucket
    WHERE l.half = 0 AND r.half = 1
      AND (CASE WHEN l.source = r.source
                 THEN {_FS_W['source'][0]} ELSE {_FS_W['source'][1]} END)
           + (CASE WHEN abs(l.n_tok - r.n_tok) <= {FS_TOK_TOL}
                 THEN {_FS_W['tokens'][0]} ELSE {_FS_W['tokens'][1]} END)
           + (CASE WHEN l.prefix = r.prefix
                 THEN {_FS_W['prefix'][0]} ELSE {_FS_W['prefix'][1]} END)
           > {FS_THRESHOLD}
"""


_PCA_PARTIAL_SCHEMA = "i int, j int, s long"


def _gram_batches(batches: "Iterator") -> "Iterator":
    """Per-Arrow-batch integer Gram update: one numpy matmul per batch,
    emitting upper-triangle partial sums plus per-dim sums (j = -1) and
    the row count (i = j = -1)."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        if pdf.empty:
            continue
        x = np.stack(pdf["embedding"].to_numpy())
        y = x.astype(np.float64) * PCA_SCALE
        # round half AWAY from zero — parity with DuckDB/Spark round()
        q = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
        g = q.T @ q  # (d, d) exact int64
        sums = q.sum(axis=0)
        d = q.shape[1]
        iu, ju = np.triu_indices(d)
        out_i = np.concatenate([iu, np.arange(d), [-1]])
        out_j = np.concatenate([ju, np.full(d, -1), [-1]])
        out_s = np.concatenate([g[iu, ju], sums, [q.shape[0]]])
        yield pd.DataFrame({"i": out_i.astype("int32"), "j": out_j.astype("int32"), "s": out_s})


def q_pca_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer covariance cells over the embedding table:
    n·Σxy − Σx·Σy for every dimension pair (upper triangle), the
    numerator of cov·n². One Gram matmul per Arrow batch map-side;
    only d(d+1)/2 + d + 1 partial rows per batch cross the shuffle."""
    emb = table(spark, sf_dir, "embeddings", spread=True).select("embedding")
    partials = emb.mapInPandas(_gram_batches, schema=_PCA_PARTIAL_SCHEMA)
    agg = partials.groupBy("i", "j").agg(F.sum("s").alias("s"))
    n = agg.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("s").alias("n")
    )
    dims = agg.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("d"), F.col("s").alias("sx")
    )
    cells = agg.filter(F.col("j") >= 0)
    return (
        cells.join(F.broadcast(dims).withColumnRenamed("d", "i_d"), F.col("i") == F.col("i_d"))
        .withColumnRenamed("sx", "sx_i")
        .join(F.broadcast(dims).withColumnRenamed("d", "j_d"), F.col("j") == F.col("j_d"))
        .withColumnRenamed("sx", "sx_j")
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            (F.col("n") * F.col("s") - F.col("sx_i") * F.col("sx_j")).alias(
                "cov_num"
            ),
            "n",
        )
    )


_PCA_SQL = f"""
    WITH q AS (
        SELECT vec_id, gs.d,
               CAST(round(embedding[gs.d + 1]::DOUBLE * {PCA_SCALE}) AS BIGINT) AS v
        FROM embeddings,
             LATERAL (SELECT unnest(generate_series(0, len(embedding) - 1)) AS d) gs
    ), cells AS (
        SELECT a.d AS i, b.d AS j, CAST(sum(a.v * b.v) AS BIGINT) AS s
        FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.d <= b.d
        GROUP BY 1, 2
    ), dims AS (
        SELECT d, CAST(sum(v) AS BIGINT) AS sx FROM q GROUP BY 1
    ), nrow AS (
        SELECT count(*) AS n FROM embeddings
    )
    SELECT CAST(c.i AS INT) AS i, CAST(c.j AS INT) AS j,
           CAST(nrow.n * c.s - di.sx * dj.sx AS BIGINT) AS cov_num,
           nrow.n
    FROM cells c
    JOIN dims di ON di.d = c.i
    JOIN dims dj ON dj.d = c.j
    CROSS JOIN nrow
"""


QUERIES = {
    "theta_intersect": q_theta_intersect,
    "record_linkage": q_record_linkage,
    "pca_cov": q_pca_cov,
}

ORACLES = {
    "theta_intersect": _THETA_SQL,
    "record_linkage": _FS_SQL,
    "pca_cov": _PCA_SQL,
}


# ---------------------------------------------------------------- batch 26

JCE_BUCKETS = 256


def q_join_card_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based join cardinality estimation (the AGMS/histogram
    trick a cost-based optimizer runs BEFORE committing to a join
    strategy): bucket each side's join key into 256 hash buckets, and
    estimate |lineitem ⋈ orders| as Σ_b cntA(b)·cntB(b). The estimate
    is an upper bound (exact when no two distinct keys share a bucket)
    and costs two map-side bucket aggregates + a 256-row join — at
    100 TB that is the difference between sizing a shuffle join from
    metadata and discovering mid-query that the join explodes. The
    exact join count is emitted alongside as the audit column."""
    li = table(spark, sf_dir, "lineitem").select(
        F.pmod(hex32(F.col("l_orderkey").cast("string")), F.lit(JCE_BUCKETS)).alias("b")
    )
    o = table(spark, sf_dir, "orders").select(
        F.pmod(hex32(F.col("o_orderkey").cast("string")), F.lit(JCE_BUCKETS)).alias("b")
    )
    ca = li.groupBy("b").agg(F.count("*").alias("ca"))
    cb = o.groupBy("b").agg(F.count("*").alias("cb"))
    est = (
        ca.join(cb, "b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("est_join_rows"))
    )
    exact = (
        table(spark, sf_dir, "lineitem")
        .join(
            table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .agg(F.count("*").alias("exact_join_rows"))
    )
    return est.crossJoin(exact).select(
        "est_join_rows",
        "exact_join_rows",
        (F.col("est_join_rows") >= F.col("exact_join_rows")).cast("int").alias(
            "upper_bound_holds"
        ),
    )


_JCE_SQL = f"""
    WITH ca AS (
        SELECT {DUCK_HEX32.format(x="CAST(l_orderkey AS VARCHAR)")} % {JCE_BUCKETS} AS b,
               count(*) AS ca
        FROM lineitem GROUP BY 1
    ), cb AS (
        SELECT {DUCK_HEX32.format(x="CAST(o_orderkey AS VARCHAR)")} % {JCE_BUCKETS} AS b,
               count(*) AS cb
        FROM orders GROUP BY 1
    ), est AS (
        SELECT CAST(sum(ca.ca * cb.cb) AS BIGINT) AS est_join_rows
        FROM ca JOIN cb ON ca.b = cb.b
    ), ex AS (
        SELECT count(*) AS exact_join_rows
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT est_join_rows, exact_join_rows,
           (est_join_rows >= exact_join_rows)::INT AS upper_bound_holds
    FROM est, ex
"""


TOPK_AGG_K = 3


def q_topk_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group WITHOUT a window: per-customer top-3 orders by
    price via groupBy + sorted-array slice. The window formulation
    (``topk``, WindowGroupLimit) sorts each partition; this aggregate
    formulation does map-side partial collect + one array_sort per
    GROUP, which wins when groups are small and numerous — the other
    standard plan shape for the same question, kept oracle-equal to the
    window answer. Sort key is a (negated cents, orderkey) struct so
    ties break identically in both engines."""
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    top = (
        o.groupBy("o_custkey")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-cents).alias("neg"),
                            F.col("o_orderkey").alias("k"),
                        )
                    )
                ),
                1,
                TOPK_AGG_K,
            ).alias("top")
        )
    )
    return top.select(
        F.col("o_custkey").alias("custkey"),
        F.posexplode("top").alias("rnk0", "s"),
    ).select(
        "custkey",
        (F.col("rnk0") + 1).cast("long").alias("rnk"),
        F.col("s.k").alias("orderkey"),
        (-F.col("s.neg")).alias("price_cents"),
    )


_TOPK_AGG_SQL = f"""
    SELECT o_custkey AS custkey,
           CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                        o_orderkey ASC) AS BIGINT) AS rnk,
           o_orderkey AS orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders
    QUALIFY rnk <= {TOPK_AGG_K}
"""


QUERIES["join_card_est"] = q_join_card_est
QUERIES["topk_agg"] = q_topk_agg
ORACLES["join_card_est"] = _JCE_SQL
ORACLES["topk_agg"] = _TOPK_AGG_SQL


# ---------------------------------------------------------------- batch 27

BM_WORDS = 64  # 32-bit words per (type, block); block = user_id div 2048


def q_bitmap_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index set algebra over per-event-type user sets — the
    EXACT counterpart to ``theta_intersect``'s estimates, the way a
    warehouse answers audience-overlap questions when ids are dense
    integers (Roaring-bitmap idiom): each (type, 4096-id block) holds 64
    packed 32-bit words built by ONE bit_or aggregate; AND/OR between two
    types' word tables then popcount gives exact |A∩B| / |A∪B| without
    ever re-touching the events table. The bitmap table is
    |types|·|blocks|·64 words no matter how many events flow in; set
    operations are an equi-join on (block, word index) over it."""
    ev = table(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    pos = ev.select(
        "event_type",
        (F.col("user_id") / (BM_WORDS * 32)).cast("long").alias("blk"),
        ((F.col("user_id") % (BM_WORDS * 32)) / 32).cast("int").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))").alias("m"),
    )
    words = pos.groupBy("event_type", "blk", "w").agg(F.bit_or("m").alias("word"))
    a = words.select(
        F.col("event_type").alias("type_a"), "blk", "w", F.col("word").alias("wa")
    )
    b = words.select(
        F.col("event_type").alias("type_b"), "blk", "w", F.col("word").alias("wb")
    )
    j = a.join(b, ["blk", "w"]).filter(F.col("type_a") < F.col("type_b"))
    inter = F.bit_count(F.col("wa").bitwiseAND(F.col("wb")))
    return (
        j.groupBy("type_a", "type_b")
        .agg(F.sum(inter).alias("n_inter"))
    )


_BM_SQL = f"""
    WITH ev AS (SELECT DISTINCT event_type, user_id FROM events),
    pos AS (
        SELECT event_type,
               user_id // {BM_WORDS * 32} AS blk,
               (user_id % {BM_WORDS * 32}) // 32 AS w,
               (CAST(1 AS BIGINT) << CAST(user_id % 32 AS INT)) AS m
        FROM ev
    ),
    words AS (
        SELECT event_type, blk, w, bit_or(m) AS word
        FROM pos GROUP BY 1, 2, 3
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(sum(bit_count(a.word & b.word)) AS BIGINT) AS n_inter
    FROM words a JOIN words b ON a.blk = b.blk AND a.w = b.w
    WHERE a.event_type < b.event_type
    GROUP BY 1, 2
"""

QUERIES["bitmap_sets"] = q_bitmap_sets
ORACLES["bitmap_sets"] = _BM_SQL


# ---------------------------------------------------------------- batch 29


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout (the experimentation-platform aggregate):
    users assign to arms by hash parity (deterministic, the same
    leakage-safe split ``split_assign`` uses), per-arm purchase-value
    stats come from ONE map-side aggregate in exact integer cents
    (n, Σx, Σx²), and the two-sample z statistic is assembled from
    those six integers with a fixed IEEE parenthesization — the whole
    experiment readout costs one scan regardless of user count. Emits
    per-arm means plus the z numerator/denominator pieces so the oracle
    checks the statistic, not just the sums."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    arm = F.pmod(hex32(F.col("user_id").cast("string")), F.lit(2)).alias("arm")
    cents = F.round(F.col("value") * 100).cast("long")
    per = (
        ev.select(arm, cents.alias("c"))
        .groupBy("arm")
        .agg(
            F.count("*").alias("n"),
            F.sum("c").alias("sx"),
            F.sum(F.col("c") * F.col("c")).alias("sxx"),
        )
    )
    a = per.filter(F.col("arm") == 0).select(
        F.col("n").alias("n0"), F.col("sx").alias("sx0"), F.col("sxx").alias("sxx0")
    )
    b = per.filter(F.col("arm") == 1).select(
        F.col("n").alias("n1"), F.col("sx").alias("sx1"), F.col("sxx").alias("sxx1")
    )
    j = a.crossJoin(b)
    mean0 = F.col("sx0") / F.col("n0")
    mean1 = F.col("sx1") / F.col("n1")
    var0 = (F.col("sxx0") - (F.col("sx0") * F.col("sx0")) / F.col("n0")) / (F.col("n0") - 1)
    var1 = (F.col("sxx1") - (F.col("sx1") * F.col("sx1")) / F.col("n1")) / (F.col("n1") - 1)
    se = F.sqrt(var0 / F.col("n0") + var1 / F.col("n1"))
    return j.select(
        "n0", "sx0", "sxx0", "n1", "sx1", "sxx1",
        mean0.alias("mean0"),
        mean1.alias("mean1"),
        ((mean1 - mean0) / se).alias("z"),
    )


_AB_SQL = f"""
    WITH per AS (
        SELECT {DUCK_HEX32.format(x="CAST(user_id AS VARCHAR)")} % 2 AS arm,
               count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sx,
               CAST(sum(CAST(round(value * 100) AS BIGINT)
                        * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sxx
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    a AS (SELECT n AS n0, sx AS sx0, sxx AS sxx0 FROM per WHERE arm = 0),
    b AS (SELECT n AS n1, sx AS sx1, sxx AS sxx1 FROM per WHERE arm = 1)
    SELECT n0, sx0, sxx0, n1, sx1, sxx1,
           sx0 / CAST(n0 AS DOUBLE) AS mean0,
           sx1 / CAST(n1 AS DOUBLE) AS mean1,
           ((sx1 / CAST(n1 AS DOUBLE)) - (sx0 / CAST(n0 AS DOUBLE)))
           / sqrt(((sxx0 - (sx0 * sx0) / CAST(n0 AS DOUBLE)) / (n0 - 1)) / n0
                  + ((sxx1 - (sx1 * sx1) / CAST(n1 AS DOUBLE)) / (n1 - 1)) / n1)
               AS z
    FROM a, b
"""


ITEM_CF_SCALE = 1_000_000


def q_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering over order baskets: cosine
    similarity between parts from co-occurrence counts —
    cooc(a,b) / sqrt(n(a)·n(b)) — the classic recsys candidate
    generator. The pair fan-out is confined to a self-join ON ORDERKEY
    (bounded by basket size, like ``basket_pairs``); per-item counts
    broadcast back onto the bounded pair table; the integer-exact
    similarity is emitted as floor(cooc²·SCALE / (n_a·n_b)) so engines
    agree bit-for-bit (monotone in true cosine, so ranking is
    preserved)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    pairs = (
        li.alias("x")
        .join(li.alias("y"), F.col("x.l_orderkey") == F.col("y.l_orderkey"))
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .groupBy(
            F.col("x.l_partkey").alias("pa"), F.col("y.l_partkey").alias("pb")
        )
        .agg(F.count("*").alias("cooc"))
        .filter(F.col("cooc") >= 2)
    )
    counts = li.groupBy("l_partkey").agg(F.countDistinct("l_orderkey").alias("n"))
    return (
        pairs.join(
            F.broadcast(counts.withColumnRenamed("l_partkey", "pa")
                        .withColumnRenamed("n", "na")), "pa"
        )
        .join(
            F.broadcast(counts.withColumnRenamed("l_partkey", "pb")
                        .withColumnRenamed("n", "nb")), "pb"
        )
        .select(
            "pa", "pb", "cooc", "na", "nb",
            F.floor(
                (F.col("cooc") * F.col("cooc") * ITEM_CF_SCALE)
                / (F.col("na") * F.col("nb"))
            ).cast("long").alias("cos2_fp"),
        )
    )


_ICF_SQL = f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT x.l_partkey AS pa, y.l_partkey AS pb, count(*) AS cooc
        FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
        WHERE x.l_partkey < y.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    counts AS (
        SELECT l_partkey, count(DISTINCT l_orderkey) AS n FROM li GROUP BY 1
    )
    SELECT pa, pb, cooc, ca.n AS na, cb.n AS nb,
           CAST(floor((cooc * cooc * {ITEM_CF_SCALE})
                      / CAST(ca.n * cb.n AS DOUBLE)) AS BIGINT) AS cos2_fp
    FROM pairs
    JOIN counts ca ON ca.l_partkey = pa
    JOIN counts cb ON cb.l_partkey = pb
"""

QUERIES["ab_test"] = q_ab_test
QUERIES["item_cf"] = q_item_cf
ORACLES["ab_test"] = _AB_SQL
ORACLES["item_cf"] = _ICF_SQL
