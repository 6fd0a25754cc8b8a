"""Training/serving data-loading operators, batch 25: greedy capacity
batching for inference, deterministic epoch shuffling, and
token-budget data selection.

Scale design (100 TB):
- ``batch_pack`` (vLLM-style inference batching): assign documents to
  serving batches of at most BATCH_CAP tokens, per source shard, in
  doc_id order — the greedy next-fit recurrence (batch breaks when the
  running total would overflow). A recurrence over a total order is
  the one shape a window cumsum canNOT express (the accumulator resets
  data-dependently), so each shard's rows fold sequentially inside ONE
  ``applyInPandas`` group — shards are the parallel unit, exactly like
  ``pack_sequences``; at 10^12 docs add pmod(hash(doc_id), K) as a
  second shard key to bound group size. The DuckDB oracle runs the
  identical recurrence as a recursive CTE, so the gate checks the fold
  itself. An oversized document gets its own batch (cap applies to the
  SUM, a single item may exceed it) — same rule both engines.
- ``epoch_shuffle``: the data-loader's deterministic global shuffle —
  per epoch, training order = rank of md5(epoch-salt | doc_id). No
  real RNG state to distribute or replay: order is a pure function of
  (seed, epoch, doc_id), reshuffles are reproducible across reruns and
  resumable mid-epoch, and the rank is one window over the hash (a
  sort — the one honest global sort a training-order materialization
  needs; at scale it is a repartitionByRange on the hash, which Spark
  plans for exactly this expression).
- ``token_budget``: data selection under a token budget ("best docs
  until 1B tokens"): order by the quality score (desc, doc_id
  tie-break), keep the prefix whose RUNNING token total stays within
  the budget. One running-sum window over the scored table; emitted
  rows carry the cumulative total so the boundary is auditable. The
  score here is the same integer quality signal ``quality_score``
  uses, so selection is engine-exact.

Reference parity: the reference has no data-loading layer; these
extend the pipeline surface like ``curation5.py``'s pack_sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .util import DUCK_HEX32, DUCK_TOKENS, hex32, table, tokens

BATCH_CAP = 96  # max tokens per serving batch
EPOCH_SEED = 1337
N_EPOCHS = 2
TOKEN_BUDGET = 3000  # corpus-prefix budget for token_budget


_BP_SCHEMA = "source string, doc_id long, n_tok long, batch_id long, batch_total long"


def _batch_pack_group(pdf):
    """Greedy next-fit fold over one shard, doc_id order."""
    import pandas as pd

    pdf = pdf.sort_values("doc_id")
    batch, acc = 0, 0
    bids, totals = [], []
    for n in pdf["n_tok"]:
        n = int(n)
        if acc > 0 and acc + n > BATCH_CAP:
            batch += 1
            acc = 0
        acc += n
        bids.append(batch)
        totals.append(acc)
    out = pd.DataFrame(
        {
            "source": pdf["source"].to_numpy(),
            "doc_id": pdf["doc_id"].to_numpy(),
            "n_tok": pdf["n_tok"].to_numpy(),
            "batch_id": bids,
            "batch_total": totals,
        }
    )
    return out


def q_batch_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-capacity batching per source shard (see module
    docstring)."""
    d = table(spark, sf_dir, "documents")
    recs = d.select(
        "source",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    return recs.groupBy("source").applyInPandas(_batch_pack_group, _BP_SCHEMA)


_TOKS = DUCK_TOKENS.format(x="text")

_BP_SQL = f"""
    WITH RECURSIVE t AS (
        SELECT source, CAST(doc_id AS BIGINT) AS doc_id,
               CAST(len({_TOKS}) AS BIGINT) AS n_tok,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents
    ),
    rec AS (
        SELECT source, doc_id, n_tok, rn,
               CAST(0 AS BIGINT) AS batch_id, n_tok AS batch_total
        FROM t WHERE rn = 1
        UNION ALL
        SELECT t.source, t.doc_id, t.n_tok, t.rn,
               CASE WHEN rec.batch_total > 0
                         AND rec.batch_total + t.n_tok > {BATCH_CAP}
                    THEN rec.batch_id + 1 ELSE rec.batch_id END,
               CASE WHEN rec.batch_total > 0
                         AND rec.batch_total + t.n_tok > {BATCH_CAP}
                    THEN t.n_tok ELSE rec.batch_total + t.n_tok END
        FROM rec JOIN t ON t.source = rec.source AND t.rn = rec.rn + 1
    )
    SELECT source, doc_id, n_tok, batch_id, batch_total FROM rec
"""


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch global shuffle order (see module
    docstring): one rank window per epoch over the salted doc hash."""
    d = table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id")
    )
    out = None
    for ep in range(N_EPOCHS):
        h = hex32(
            F.concat(
                F.lit(f"ep{EPOCH_SEED}.{ep}|"), F.col("doc_id").cast("string")
            )
        )
        w = Window.orderBy(h.asc(), F.col("doc_id").asc())
        part = d.select(
            "doc_id",
            F.lit(ep).cast("long").alias("epoch"),
            (F.row_number().over(w) - 1).cast("long").alias("pos"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def _epoch_sql() -> str:
    parts = []
    for ep in range(N_EPOCHS):
        h = DUCK_HEX32.format(
            x=f"'ep{EPOCH_SEED}.{ep}|' || CAST(doc_id AS VARCHAR)"
        )
        parts.append(f"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST({ep} AS BIGINT) AS epoch,
                   CAST(row_number() OVER (ORDER BY {h} ASC, doc_id ASC) - 1
                        AS BIGINT) AS pos
            FROM documents
        """)
    return " UNION ALL ".join(parts)


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked corpus prefix under a token budget (see module
    docstring). Score = integer quality signal: distinct-token count
    minus a penalty for very short docs."""
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    scored = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("long").alias("score"),
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    run = scored.select(
        "doc_id",
        "n_tok",
        "score",
        F.sum("n_tok").over(w).alias("cum_tok"),
    )
    return run.filter(F.col("cum_tok") <= TOKEN_BUDGET)


_TB_SQL = f"""
    WITH scored AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(len({_TOKS}) AS BIGINT) AS n_tok,
               CAST(len(list_distinct({_TOKS})) AS BIGINT) AS score
        FROM documents
    )
    SELECT doc_id, n_tok, score,
           CAST(sum(n_tok) OVER (ORDER BY score DESC, doc_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tok
    FROM scored
    QUALIFY cum_tok <= {TOKEN_BUDGET}
"""


QUERIES = {
    "batch_pack": q_batch_pack,
    "epoch_shuffle": q_epoch_shuffle,
    "token_budget": q_token_budget,
}

ORACLES = {
    "batch_pack": _BP_SQL,
    "epoch_shuffle": _epoch_sql(),
    "token_budget": _TB_SQL,
}
