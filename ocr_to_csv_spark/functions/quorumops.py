"""Replication protocols, batch 166: the quorum-intersection read/write
audit (R+W>N ⇒ reads see the latest write; R+W≤N ⇒ staleness is
possible and observed) and a chain-replication consistency audit (the
tail is never ahead of any upstream node, so tail reads are committed)
— the protocol-level guarantees beneath the CRDT batch, checked over
deterministic per-replica staleness.

Scale design (100 TB):
- K=32 keys synthesized from the corpus key space; per (key, replica)
  the held version = latest − md5-lag (lag 0 forced on the write
  quorum). Both audits are ONE keyed pivot (N=5 replica columns) plus
  bounded expressions — no joins at all beyond the scan.
- ``quorum_rw``: the write quorum is the W lowest-hash replicas per
  key; a read polls the R lowest replicas under an INDEPENDENT hash.
  With R=3, W=3, N=5 the quorums intersect by counting, so
  read_safe = latest (pinned for every key); with R=2 the audit
  records the keys where the read is stale — the protocol boundary
  made visible in data.
- ``chain_replication``: versions decay monotonically down the chain
  (cumulative md5 lags), so the tail holds the committed minimum;
  tail ≤ every node and head − tail = uncommitted window, both
  emitted and pinned.

Reference parity: no replication layer in the reference; extends
crdt_gcounter/crdt_orset, merkle_diff, ring_rebalance.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

N_REP = 5
Q_KEYS = 32
W_Q = 3
R_SAFE = 3
R_UNSAFE = 2


def _h(tag: str) -> int:
    return int(hashlib.md5(tag.encode()).hexdigest()[:8], 16)


def _keys_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    k = (F.col("o_orderkey") % Q_KEYS).alias("key")
    return o.groupBy(k).agg(
        F.max(F.col("o_orderkey")).cast("long").alias("latest")
    )


def q_quorum_rw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per key (module doc): (key, latest, read_safe, read_unsafe,
    safe_ok, unsafe_stale)."""
    keys = _keys_df(spark, sf_dir)
    rows = []
    for kk in range(Q_KEYS):
        wr_order = sorted(range(N_REP), key=lambda r: (_h(f"qw|{kk}|{r}"), r))
        rd_order = sorted(range(N_REP), key=lambda r: (_h(f"qr|{kk}|{r}"), r))
        write_set = set(wr_order[:W_Q])
        versions = {}
        for r in range(N_REP):
            lag = 0 if r in write_set else _h(f"ql|{kk}|{r}") % 50 + 1
            versions[r] = lag  # held = latest - lag
        safe = min(versions[r] for r in rd_order[:R_SAFE])
        unsafe = min(versions[r] for r in rd_order[:R_UNSAFE])
        rows.append((kk, safe, unsafe))
    lag_safe = F.array(*[F.lit(s).cast("long") for _, s, _ in rows])
    lag_unsafe = F.array(*[F.lit(u).cast("long") for _, _, u in rows])
    idx = F.col("key").cast("int") + 1
    return keys.select(
        F.col("key").cast("long").alias("key"),
        "latest",
        (F.col("latest") - F.element_at(lag_safe, idx)).alias("read_safe"),
        (F.col("latest") - F.element_at(lag_unsafe, idx)).alias(
            "read_unsafe"
        ),
        (F.element_at(lag_safe, idx) == 0).cast("long").alias("safe_ok"),
        (F.element_at(lag_unsafe, idx) > 0).cast("long").alias(
            "unsafe_stale"
        ),
    ).orderBy("key")


def q_chain_replication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per key (module doc): (key, head_v, tail_v, window,
    tail_is_min)."""
    keys = _keys_df(spark, sf_dir)
    # cumulative lags down the chain: node i holds latest - cum_i
    cums = []
    for kk in range(Q_KEYS):
        cum = 0
        node_lags = []
        for i in range(N_REP):
            cum += _h(f"cl|{kk}|{i}") % 20
            node_lags.append(cum)
        cums.append(node_lags)
    heads = F.array(*[F.lit(c[0]).cast("long") for c in cums])
    tails = F.array(*[F.lit(c[-1]).cast("long") for c in cums])
    maxs = F.array(*[F.lit(max(c)).cast("long") for c in cums])
    idx = F.col("key").cast("int") + 1
    return keys.select(
        F.col("key").cast("long").alias("key"),
        (F.col("latest") - F.element_at(heads, idx)).alias("head_v"),
        (F.col("latest") - F.element_at(tails, idx)).alias("tail_v"),
        (F.element_at(tails, idx) - F.element_at(heads, idx)).alias(
            "window"
        ),
        (F.element_at(tails, idx) == F.element_at(maxs, idx))
        .cast("long")
        .alias("tail_is_min"),
    ).orderBy("key")


def _lag_lists():
    safe, unsafe = [], []
    for kk in range(Q_KEYS):
        wr_order = sorted(range(N_REP), key=lambda r: (_h(f"qw|{kk}|{r}"), r))
        rd_order = sorted(range(N_REP), key=lambda r: (_h(f"qr|{kk}|{r}"), r))
        write_set = set(wr_order[:W_Q])
        versions = {
            r: (0 if r in write_set else _h(f"ql|{kk}|{r}") % 50 + 1)
            for r in range(N_REP)
        }
        safe.append(min(versions[r] for r in rd_order[:R_SAFE]))
        unsafe.append(min(versions[r] for r in rd_order[:R_UNSAFE]))
    return safe, unsafe


def _quorum_sql() -> str:
    safe, unsafe = _lag_lists()
    sl = "[" + ", ".join(str(x) for x in safe) + "]"
    ul = "[" + ", ".join(str(x) for x in unsafe) + "]"
    return f"""
WITH keys AS (
    SELECT o_orderkey % {Q_KEYS} AS key,
           max(o_orderkey)::BIGINT AS latest
    FROM orders GROUP BY 1
)
SELECT key::BIGINT AS key, latest,
       (latest - ({sl})[key::INT + 1])::BIGINT AS read_safe,
       (latest - ({ul})[key::INT + 1])::BIGINT AS read_unsafe,
       (({sl})[key::INT + 1] = 0)::BIGINT AS safe_ok,
       (({ul})[key::INT + 1] > 0)::BIGINT AS unsafe_stale
FROM keys
ORDER BY key
"""


def _chain_sql() -> str:
    heads, tails, maxs = [], [], []
    for kk in range(Q_KEYS):
        cum = 0
        node_lags = []
        for i in range(N_REP):
            cum += _h(f"cl|{kk}|{i}") % 20
            node_lags.append(cum)
        heads.append(node_lags[0])
        tails.append(node_lags[-1])
        maxs.append(max(node_lags))
    hl = "[" + ", ".join(str(x) for x in heads) + "]"
    tl = "[" + ", ".join(str(x) for x in tails) + "]"
    ml = "[" + ", ".join(str(x) for x in maxs) + "]"
    return f"""
WITH keys AS (
    SELECT o_orderkey % {Q_KEYS} AS key,
           max(o_orderkey)::BIGINT AS latest
    FROM orders GROUP BY 1
)
SELECT key::BIGINT AS key,
       (latest - ({hl})[key::INT + 1])::BIGINT AS head_v,
       (latest - ({tl})[key::INT + 1])::BIGINT AS tail_v,
       (({tl})[key::INT + 1] - ({hl})[key::INT + 1])::BIGINT AS window,
       (({tl})[key::INT + 1] = ({ml})[key::INT + 1])::BIGINT
           AS tail_is_min
FROM keys
ORDER BY key
"""


QUERIES = {
    "quorum_rw": q_quorum_rw,
    "chain_replication": q_chain_replication,
}

ORACLES = {
    "quorum_rw": _quorum_sql(),
    "chain_replication": _chain_sql(),
}
