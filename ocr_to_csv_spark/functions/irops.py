"""Retrieval & graph-structure ops, batch 10: reciprocal-rank fusion,
winnowing candidate pairs, k-core peeling, vocabulary coverage / OOV
rate, and per-user lag/lead deltas.

Scale design (100 TB):
- ``rrf_fusion`` is the standard hybrid-retrieval combiner (Cormack et
  al.: score = Σ 1/(k + rank_i)): every window is PARTITIONED BY the
  query token, so ranking never funnels through one task; candidate
  lists are per-query-sized, the fusion itself is two exact IEEE
  divisions + one add (bit-identical across engines).
- ``winnow_pairs`` turns the MOSS fingerprints (``curation6.winnowing``)
  into candidate duplicate PAIRS the scalable way: distinct (doc, fp),
  drop boilerplate fingerprints shared by > FP_CAP docs (the classic
  stopword-shingle suppression — also the skew guard: no hot-key bucket
  ever exceeds FP_CAP²/2 pairs), self-join on fp, count shared prints
  per pair. Only fingerprint ids cross the shuffle, never text.
- ``kcore`` is the degeneracy peel (k=2, fixed rounds): each round one
  degree aggregate + two semi-joins against the surviving node set —
  Pregel-shaped, nothing node-sized on the driver, same plan at 10^9
  edges. Fixed-round so both engines unroll identically.
- ``vocab_coverage`` is the tokenizer-coverage gate run before
  training: the top-V vocabulary is corpus-frequency top-512
  (TakeOrderedAndProject — vocab-sized, never a global sort of the
  token stream), broadcast back for a semi-join count per document;
  OOV rate is one exact division.
- ``lag_delta`` is per-entity sequential feature extraction (lag/lead
  windows keyed by user): value deltas and inter-event gaps, the shape
  behind rate-limiting features and bot detection. Partitioned window,
  deterministic total order (ts, event_id, value, event_type).

Reference parity: the reference has no retrieval/graph layer; these are
training-data-pipeline extensions (builder brief) in the same family as
``textops.py`` / ``curation6.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import curation6
from .util import DUCK_TOKENS, table, tokens

RRF_K = 60  # reciprocal-rank-fusion damping constant
RRF_TOP = 10  # fused results kept per query token
RRF_PROBES = ["the", "data", "merge", "batch"]
FP_CAP = 50  # winnowing: drop fingerprints shared by more docs (boilerplate)
PAIR_MIN = 2  # winnowing: min shared fingerprints to emit a pair
KCORE_K = 2  # k-core threshold
KCORE_ROUNDS = 4  # fixed peeling rounds (documented, not to-fixpoint)
VOCAB_V = 512  # vocabulary size for coverage / OOV


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two per-query document rankings — by
    term frequency and by earliest term position — for a fixed set of
    probe tokens. rrf = 1/(60+r_tf) + 1/(60+r_pos); top 10 fused docs
    per token. All windows partition by the query token."""
    d = table(spark, sf_dir, "documents", spread=True)
    tk = d.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    ).filter(F.col("tok").isin(RRF_PROBES))
    g = tk.groupBy("tok", "doc_id").agg(
        F.count("*").alias("tf"), F.min("pos").alias("fpos")
    )
    w1 = Window.partitionBy("tok").orderBy(F.desc("tf"), F.asc("doc_id"))
    w2 = Window.partitionBy("tok").orderBy(F.asc("fpos"), F.asc("doc_id"))
    r = g.select(
        "tok",
        "doc_id",
        F.row_number().over(w1).cast("long").alias("rank_tf"),
        F.row_number().over(w2).cast("long").alias("rank_pos"),
    ).withColumn(
        "rrf_score",
        F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_tf")).cast("double")
        + F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_pos")).cast("double"),
    )
    wf = Window.partitionBy("tok").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        r.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= RRF_TOP)
        .select(
            F.col("tok").alias("token"),
            "doc_id",
            "rank_tf",
            "rank_pos",
            "rrf_score",
        )
    )


_RRF_PROBES_SQL = ", ".join(f"'{t}'" for t in RRF_PROBES)

_RRF_SQL = f"""
    WITH t AS (
        SELECT doc_id, {DUCK_TOKENS.format(x='text')} AS toks FROM documents
    ),
    ix AS (
        SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t
    ),
    tk AS (
        SELECT doc_id, toks[i] AS tok, i FROM ix
        WHERE toks[i] IN ({_RRF_PROBES_SQL})
    ),
    g AS (
        SELECT tok, doc_id, count(*)::BIGINT AS tf, min(i) AS fpos
        FROM tk GROUP BY tok, doc_id
    ),
    r AS (
        SELECT tok, doc_id,
               row_number() OVER (
                   PARTITION BY tok ORDER BY tf DESC, doc_id ASC
               )::BIGINT AS rank_tf,
               row_number() OVER (
                   PARTITION BY tok ORDER BY fpos ASC, doc_id ASC
               )::BIGINT AS rank_pos
        FROM g
    ),
    s AS (
        SELECT tok, doc_id, rank_tf, rank_pos,
               1.0::DOUBLE / ({RRF_K} + rank_tf)::DOUBLE
             + 1.0::DOUBLE / ({RRF_K} + rank_pos)::DOUBLE AS rrf_score
        FROM r
    )
    SELECT tok AS token, doc_id, rank_tf, rank_pos, rrf_score
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY tok ORDER BY rrf_score DESC, doc_id ASC
        ) AS rn FROM s
    ) WHERE rn <= {RRF_TOP}
"""


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-passage CANDIDATE PAIRS from winnowing
    fingerprints (the MOSS join): distinct (doc, fp), boilerplate
    fingerprints (> FP_CAP docs) dropped, equi-self-join on fp with
    doc_a < doc_b, pairs with >= PAIR_MIN shared prints kept."""
    fp = (
        curation6.q_winnowing(spark, sf_dir)
        .select("doc_id", "fp")
        .distinct()
        .localCheckpoint()  # stage once: fingerprinting is the expensive
        # map stage and feeds THREE consumers (freq, join-left, join-right);
        # without staging Spark recomputes it per consumer (ReusedExchange
        # distrust — see PLANS.md). Production analogue: a scratch table.
    )
    freq = fp.groupBy("fp").agg(F.count("*").alias("nd"))
    fp = fp.join(
        F.broadcast(freq.filter(F.col("nd") > FP_CAP).select("fp")),
        "fp",
        "left_anti",
    )
    a = fp.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fp.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= PAIR_MIN)
    )


_WINNOW_PAIRS_SQL = f"""
    WITH wfp_all AS ({curation6.ORACLES['winnowing']}),
    wfp AS (SELECT DISTINCT doc_id, fp FROM wfp_all),
    keep AS (
        SELECT fp FROM wfp GROUP BY fp HAVING count(*) <= {FP_CAP}
    ),
    f AS (SELECT w.doc_id, w.fp FROM wfp w JOIN keep k ON k.fp = w.fp)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
    FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= {PAIR_MIN}
"""


def _und_edges(nodes: DataFrame, n: int) -> DataFrame:
    """Distinct undirected (no self-loop) view of the shared modular
    link graph (see graphtext._edges / textops.q_pagerank)."""
    i = F.col("id")
    e1 = nodes.filter(i % 3 != 0).select(i.alias("src"), ((i * 2 + 1) % n).alias("dst"))
    e2 = nodes.filter(i % 2 == 0).select(i.alias("src"), ((i * 7 + 3) % n).alias("dst"))
    e3 = nodes.filter(i % 6 == 1).select(i.alias("src"), ((i + n // 2) % n).alias("dst"))
    e = e1.unionByName(e2).unionByName(e3)
    return (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (k=2, 4 fixed rounds) over the undirected modular
    graph: each round drop nodes with degree < k and their incident
    edges. Survivors are reported with their residual degree. One
    degree aggregate + two semi-joins per round — the degeneracy
    decomposition inner loop at any scale."""
    d = table(spark, sf_dir, "documents", spread=True)
    n = d.count()
    nodes = d.select(F.col("doc_id").cast("long").alias("id"))
    e = _und_edges(nodes, n).localCheckpoint()
    for _ in range(KCORE_ROUNDS):
        deg = e.groupBy("src").agg(F.count("*").alias("c"))
        keep = deg.filter(F.col("c") >= KCORE_K).select("src")
        # localCheckpoint each round: e_{r+1} references e_r three times
        # (directly + via both semi-join keep sides); without truncation
        # the plan tree grows 3^rounds branches and the optimizer blows up.
        e = (
            e.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .localCheckpoint()
        )
    return (
        e.groupBy("src")
        .agg(F.count("*").alias("degree"))
        .select(F.col("src").alias("doc_id"), F.col("degree").cast("long"))
    )


_KCORE_SQL_HEAD = """
    WITH nodes AS (SELECT doc_id::BIGINT AS id FROM documents),
    nn AS (SELECT count(*)::BIGINT AS n FROM documents),
    de AS (
        SELECT id AS src, (id*2+1) %% (SELECT n FROM nn) AS dst
        FROM nodes WHERE id %% 3 <> 0
        UNION ALL
        SELECT id, (id*7+3) %% (SELECT n FROM nn) FROM nodes WHERE id %% 2 = 0
        UNION ALL
        SELECT id, (id + (SELECT n FROM nn) // 2) %% (SELECT n FROM nn)
        FROM nodes WHERE id %% 6 = 1
    ),
    e0 AS (
        SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM de UNION ALL SELECT dst, src FROM de
        ) WHERE src <> dst
    ),
    %s
    SELECT src AS doc_id, count(*)::BIGINT AS degree FROM e%d GROUP BY src
"""

_KCORE_STEP = """
    d%d AS (SELECT src, count(*)::BIGINT AS c FROM e%d GROUP BY src),
    k%d AS (SELECT src FROM d%d WHERE c >= %d),
    e%d AS (
        SELECT e.src, e.dst FROM e%d e
        JOIN k%d a ON a.src = e.src
        JOIN k%d b ON b.src = e.dst
    )
"""


def _kcore_oracle_sql() -> str:
    steps = ",".join(
        _KCORE_STEP % (r + 1, r, r + 1, r + 1, KCORE_K, r + 1, r, r + 1, r + 1)
        for r in range(KCORE_ROUNDS)
    )
    return _KCORE_SQL_HEAD % (steps, KCORE_ROUNDS)  # %-format folds %% -> %


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage per document: vocabulary = corpus
    top-512 tokens by frequency (ties → token asc), per-doc in-vocab
    token count via a broadcast semi-join, OOV rate as one exact
    division. The gate that catches a corpus slice the tokenizer was
    never trained on (wrong language / binary junk)."""
    d = table(spark, sf_dir, "documents", spread=True)
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(VOCAB_V)
        .select("tok")
    )
    per_doc = toks.groupBy("doc_id").agg(F.count("*").alias("n_toks"))
    in_v = (
        toks.join(F.broadcast(vocab), "tok", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_vocab"))
    )
    return (
        per_doc.join(in_v, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_toks").cast("long").alias("n_toks"),
            F.coalesce("n_vocab", F.lit(0)).cast("long").alias("n_vocab"),
        )
        .withColumn(
            "oov_rate",
            F.lit(1.0)
            - F.col("n_vocab").cast("double") / F.col("n_toks").cast("double"),
        )
    )


_VOCAB_SQL = f"""
    WITH t AS (
        SELECT doc_id, {DUCK_TOKENS.format(x='text')} AS toks FROM documents
    ),
    ex AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    vocab AS (
        SELECT tok FROM (
            SELECT tok, count(*) AS cnt FROM ex GROUP BY tok
            ORDER BY cnt DESC, tok ASC LIMIT {VOCAB_V}
        )
    ),
    pd AS (SELECT doc_id, count(*)::BIGINT AS n_toks FROM ex GROUP BY doc_id),
    iv AS (
        SELECT doc_id, count(*)::BIGINT AS n_vocab FROM ex
        WHERE tok IN (SELECT tok FROM vocab) GROUP BY doc_id
    )
    SELECT pd.doc_id, pd.n_toks,
           coalesce(iv.n_vocab, 0)::BIGINT AS n_vocab,
           1.0::DOUBLE - coalesce(iv.n_vocab, 0)::DOUBLE / pd.n_toks::DOUBLE
               AS oov_rate
    FROM pd LEFT JOIN iv ON iv.doc_id = pd.doc_id
"""


def q_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sequential deltas over events: value change and
    inter-event gap (seconds) vs the previous event in a deterministic
    total order (ts, event_id, value, event_type). Null user_ids are
    excluded (they are the dq_audit violation class, not a sequence).
    Window is PARTITIONED BY user — shuffles once on the entity key,
    the sequence-feature shape at any scale."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy(
        "ts", "event_id", "value", "event_type"
    )
    prev_v = F.lag("value").over(w)
    prev_ts = F.lag("ts").over(w)
    return e.select(
        "event_id",
        "user_id",
        prev_v.isNotNull().alias("has_prev"),
        F.coalesce(F.col("value") - prev_v, F.lit(0.0)).alias("delta_value"),
        F.coalesce(
            F.unix_timestamp("ts") - F.unix_timestamp(prev_ts), F.lit(0)
        )
        .cast("long")
        .alias("gap_s"),
    )


_LAG_SQL = """
    SELECT event_id, user_id,
           (lag(value) OVER w IS NOT NULL) AS has_prev,
           coalesce(value - lag(value) OVER w, 0.0)::DOUBLE AS delta_value,
           coalesce(
               floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT,
               0
           )::BIGINT AS gap_s
    FROM events
    WHERE user_id IS NOT NULL
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, event_id, value, event_type
    )
"""


QUERIES = {
    "rrf_fusion": q_rrf_fusion,
    "winnow_pairs": q_winnow_pairs,
    "kcore": q_kcore,
    "vocab_coverage": q_vocab_coverage,
    "lag_delta": q_lag_delta,
}

ORACLES = {
    "rrf_fusion": _RRF_SQL,
    "winnow_pairs": _WINNOW_PAIRS_SQL,
    "kcore": _kcore_oracle_sql(),
    "vocab_coverage": _VOCAB_SQL,
    "lag_delta": _LAG_SQL,
}
