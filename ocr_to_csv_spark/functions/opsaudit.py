"""Operational audits, batch 121: consistent-hashing rebalance cost
when a node joins the ring, and the front-coding compression estimate
for the sorted term dictionary — the two numbers an index/storage
operator checks before a topology change or a dictionary format
choice.

Scale design (100 TB):
- ``ring_rebalance``: both ring layouts (N nodes and N+1, same
  md5 virtual-node points as ring_assign — data-independent literals
  shared verbatim with the oracle) are evaluated MAP-SIDE per document
  (two bounded array scans per row); the (old_node, new_node) movement
  matrix is one keyed aggregate with ≤(N+1)² output rows, and the
  headline movement fraction rides the same rollup. The consistent-
  hashing guarantee (≈1/(N+1) of keys move, all TO the new node) is
  the assertion the audit exists to check before rebalancing 10^12
  objects.
- ``dict_compress_est``: the term dictionary is vocabulary-bounded
  after ONE distinct aggregate; front-coding savings = length of the
  longest common prefix with the lexicographic predecessor (one lag
  window over the term sort — the postings/prefix_autocomplete
  discipline), summed exactly. Output is one row: raw vs front-coded
  byte totals and the savings ratio in exact milli — the number that
  decides whether the 10^12-term dictionary ships front-coded.

Reference parity: no ops layer in the reference; extends the placement
family (ring_assign, split_assign, partition_quality, layout_advisor)
and the index family (postings, prefix_autocomplete, compress_ratio).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .curation8 import N_NODES, N_VNODES, _h32
from .util import DUCK_HEX32, DUCK_TOKENS, hex32, table

LCP_MAX = 24  # chars compared for the front-coding prefix


def _ring(n_nodes: int) -> tuple[list[int], list[int]]:
    pts = sorted(
        (_h32(f"ring|{node}.{v}"), node)
        for node in range(n_nodes)
        for v in range(N_VNODES)
    )
    return [p for p, _ in pts], [n for _, n in pts]


def _assign(pts: list[int], nodes: list[int]):
    n = len(pts)
    pts_arr = F.array([F.lit(p) for p in pts])
    nodes_arr = F.array([F.lit(x) for x in nodes])
    k = hex32(F.concat(F.lit("doc|"), F.col("doc_id").cast("string")))
    idxs = F.filter(
        F.sequence(F.lit(1), F.lit(n)),
        lambda i: F.element_at(pts_arr, i) >= k,
    )
    return F.element_at(nodes_arr, F.coalesce(F.array_min(idxs), F.lit(1)))


def q_ring_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Movement matrix when node N joins the ring (module doc):
    (old_node, new_node, n_docs, moved, total_docs, moved_total)."""
    d = table(spark, sf_dir, "documents", spread=True)
    p0, n0 = _ring(N_NODES)
    p1, n1 = _ring(N_NODES + 1)
    assigned = d.select(
        _assign(p0, n0).cast("long").alias("old_node"),
        _assign(p1, n1).cast("long").alias("new_node"),
    )
    cells = assigned.groupBy("old_node", "new_node").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = cells.agg(
        F.sum("n_docs").alias("total_docs"),
        F.sum(
            F.when(F.col("old_node") != F.col("new_node"), F.col("n_docs"))
            .otherwise(0)
        ).alias("moved_total"),
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "old_node",
            "new_node",
            F.col("n_docs").cast("long").alias("n_docs"),
            (F.col("old_node") != F.col("new_node")).cast("long").alias(
                "moved"
            ),
            F.col("total_docs").cast("long").alias("total_docs"),
            F.col("moved_total").cast("long").alias("moved_total"),
        )
        .orderBy("old_node", "new_node")
    )


def _ring_sql_arrays(n_nodes: int) -> tuple[str, str, int]:
    pts, nodes = _ring(n_nodes)
    return (
        "[" + ", ".join(str(p) for p in pts) + "]",
        "[" + ", ".join(str(x) for x in nodes) + "]",
        len(pts),
    )


def _rebalance_sql() -> str:
    p0, n0, l0 = _ring_sql_arrays(N_NODES)
    p1, n1, l1 = _ring_sql_arrays(N_NODES + 1)
    k = DUCK_HEX32.format(x="'doc|' || doc_id::VARCHAR")
    pick = (
        "({nodes})[coalesce(list_min(list_filter(generate_series(1, {n}), "
        "i -> ({pts})[i] >= {k})), 1)]"
    )
    return f"""
WITH assigned AS (
    SELECT {pick.format(nodes=n0, n=l0, pts=p0, k=k)}::BIGINT AS old_node,
           {pick.format(nodes=n1, n=l1, pts=p1, k=k)}::BIGINT AS new_node
    FROM documents
),
cells AS (
    SELECT old_node, new_node, count(*)::BIGINT AS n_docs
    FROM assigned GROUP BY old_node, new_node
),
tot AS (
    SELECT sum(n_docs)::BIGINT AS total_docs,
           sum(CASE WHEN old_node <> new_node THEN n_docs ELSE 0 END)::BIGINT
               AS moved_total
    FROM cells
)
SELECT c.old_node, c.new_node, c.n_docs,
       (CASE WHEN c.old_node <> c.new_node THEN 1 ELSE 0 END)::BIGINT AS moved,
       t.total_docs, t.moved_total
FROM cells c CROSS JOIN tot t
ORDER BY c.old_node, c.new_node
"""


def q_dict_compress_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Front-coding savings over the sorted term dictionary
    (module doc): one row (n_terms, raw_bytes, lcp_bytes, fc_bytes,
    savings_milli)."""
    d = table(spark, sf_dir, "documents", spread=True)
    terms = (
        d.select(F.explode(F.split("text", r"\s+")).alias("t"))
        .filter(F.col("t") != "")
        .distinct()
    )
    w = Window.orderBy("t")
    lagged = terms.withColumn("prev", F.lag("t").over(w))
    cmp_len = F.least(
        F.least(F.length("t"), F.length("prev")), F.lit(LCP_MAX)
    )
    matches = F.filter(
        F.sequence(F.lit(1), cmp_len),
        lambda i: F.substr(F.col("t"), F.lit(1), i)
        == F.substr(F.col("prev"), F.lit(1), i),
    )
    lcp = F.when(
        F.col("prev").isNull(), F.lit(0)
    ).otherwise(F.coalesce(F.array_max(matches), F.lit(0)))
    scored = lagged.select(
        F.length("t").cast("long").alias("raw"),
        lcp.cast("long").alias("lcp"),
    )
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("raw").alias("raw_bytes"),
        F.sum("lcp").alias("lcp_bytes"),
    )
    return agg.select(
        F.col("n_terms").cast("long").alias("n_terms"),
        F.col("raw_bytes").cast("long").alias("raw_bytes"),
        F.col("lcp_bytes").cast("long").alias("lcp_bytes"),
        (F.col("raw_bytes") - F.col("lcp_bytes")).cast("long").alias(
            "fc_bytes"
        ),
        F.floor(F.col("lcp_bytes") * 1000 / F.col("raw_bytes"))
        .cast("long")
        .alias("savings_milli"),
    )


_DICT_SQL = f"""
WITH terms AS (
    SELECT DISTINCT t FROM (
        SELECT unnest({DUCK_TOKENS.format(x="text")}) AS t FROM documents
    )
),
lagged AS (
    SELECT t, lag(t) OVER (ORDER BY t) AS prev FROM terms
),
scored AS (
    SELECT length(t)::BIGINT AS raw,
           CASE WHEN prev IS NULL THEN 0
                ELSE coalesce(list_max(list_filter(
                    generate_series(1, least(least(length(t), length(prev)),
                                             {LCP_MAX})),
                    i -> substr(t, 1, i) = substr(prev, 1, i))), 0)
           END::BIGINT AS lcp
    FROM lagged
)
SELECT count(*)::BIGINT AS n_terms,
       sum(raw)::BIGINT AS raw_bytes,
       sum(lcp)::BIGINT AS lcp_bytes,
       (sum(raw) - sum(lcp))::BIGINT AS fc_bytes,
       CAST(floor(sum(lcp) * 1000.0 / sum(raw)) AS BIGINT) AS savings_milli
FROM scored
"""


QUERIES = {
    "ring_rebalance": q_ring_rebalance,
    "dict_compress_est": q_dict_compress_est,
}

ORACLES = {
    "ring_rebalance": _rebalance_sql(),
    "dict_compress_est": _DICT_SQL,
}
