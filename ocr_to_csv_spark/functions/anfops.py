"""Approximate neighborhood function, batch 116: HyperANF
(Boldi–Vigna) over the shared undirected link graph — per-node HLL
register sketches propagated along edges for H=2 supersteps, then
audited node-by-node against the EXACT 2-ball (ball2_size's
construction) so the sketch's error is itself a query output.

Scale design (100 TB):
- The per-node state is (node, bucket, rho) register ROWS — at most
  m=16 per node, merged by MAX, so every superstep is one keyed
  equi-join (edges ⋈ state on the neighbor) + one (node, bucket) MAX
  aggregate: the identical Pregel-in-DataFrame plan as
  pagerank/bfs_dist, with partial aggregation map-side because MAX is
  associative. Nothing node-sized collects; H rounds cost H joins.
  This is exactly why HyperANF scales where the exact neighborhood
  function (|frontier| blow-up) does not: state stays O(nodes·m)
  FOREVER, while the exact 2-ball join below is already
  O(Σ deg²).
- The estimate (alpha_16·m²·2^29 / T with linear-counting small-range
  correction) is the hll_distinct formula at m=16 — integer register
  math end-to-end, the only floats being the final alpha/ln step
  computed by the identical expression in both engines and rounded to
  MILLI-units per node BEFORE the exact int64 sum (no float ever
  crosses an aggregation boundary).
- The audit joins each node's estimate to its exact ball2+1 (self
  included) and rolls up by exact size — output is ball-size-bounded
  (≤ 14 rows), however large the graph.

Reference parity: no graph layer in the reference; the approximate
member of the reach family (ball2_size, temporal_reach,
diameter_sweep), and the sketch the crawl planner would actually run
at 10^12 edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .linkpred import _EDGES_SQL, _undirected_edges
from .util import DUCK_HEX32, hex32

ANF_M = 16  # registers per node
ANF_RHO0 = 29  # rho for w == 0 (w < 2^28 after the bucket split)
ANF_POW = 1 << ANF_RHO0
ANF_ALPHA = 0.673  # alpha_16
ANF_H = 2  # supersteps == the exact ball radius audited against


def q_anf_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperANF 2-ball estimates rolled up by exact 2-ball size
    (module doc): (ball2p1, n_nodes, sum_est_milli, exact_total)."""
    ue = _undirected_edges(spark, sf_dir).cache()
    adj = ue.select(F.col("lo").alias("node"), F.col("hi").alias("nbr")).unionByName(
        ue.select(F.col("hi").alias("node"), F.col("lo").alias("nbr"))
    )
    nodes = adj.select("node").union(adj.select(F.col("nbr").alias("node"))).distinct()
    h = hex32(F.concat(F.lit("anf|"), F.col("node").cast("string")))
    st = nodes.select(
        "node",
        (h % ANF_M).alias("bucket"),
        F.when(F.floor(h / ANF_M) == 0, F.lit(ANF_RHO0))
        .otherwise(
            F.lit(ANF_RHO0) - F.length(F.conv(F.floor(h / ANF_M).cast("long"), 10, 2))
        )
        .cast("int")
        .alias("rho"),
    )
    for _ in range(ANF_H):
        prop = adj.join(
            st.select(F.col("node").alias("nbr"), "bucket", "rho"), "nbr"
        ).select("node", "bucket", "rho")
        st = (
            st.unionByName(prop)
            .groupBy("node", "bucket")
            .agg(F.max("rho").alias("rho"))
        )
    per = st.groupBy("node").agg(
        F.count(F.lit(1)).alias("npresent"),
        F.sum(F.expr(f"shiftleft(1L, cast({ANF_RHO0} - rho as int))")).alias("s"),
    )
    T = F.col("s") + (F.lit(ANF_M) - F.col("npresent")) * F.lit(ANF_POW)
    raw = F.lit(ANF_ALPHA) * F.lit(float(ANF_M * ANF_M * ANF_POW)) / T
    V = F.lit(ANF_M) - F.col("npresent")
    est = F.when(
        (raw <= F.lit(2.5 * ANF_M)) & (V > 0),
        F.lit(float(ANF_M)) * F.log(F.lit(float(ANF_M)) / V),
    ).otherwise(raw)
    node_est = per.select(
        "node", F.round(est * 1000).cast("long").alias("est_milli")
    )
    two_hop = adj.select("node", F.col("nbr").alias("mid")).join(
        adj.select(F.col("node").alias("mid"), F.col("nbr").alias("far")), "mid"
    ).select("node", F.col("far").alias("nbr"))
    ball = (
        adj.select("node", "nbr")
        .unionByName(two_hop)
        .filter(F.col("node") != F.col("nbr"))
        .distinct()
    )
    b2 = ball.groupBy("node").agg(F.count(F.lit(1)).alias("ball2"))
    j = node_est.join(b2, "node", "left").select(
        "node",
        (F.coalesce("ball2", F.lit(0)) + 1).cast("long").alias("ball2p1"),
        "est_milli",
    )
    return (
        j.groupBy("ball2p1")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("est_milli").cast("long").alias("sum_est_milli"),
            (F.first("ball2p1") * F.count(F.lit(1))).cast("long").alias(
                "exact_total"
            ),
        )
        .orderBy("ball2p1")
    )


_H = DUCK_HEX32.format(x="'anf|' || node::VARCHAR")

_ANF_SQL = (
    _EDGES_SQL
    + f""",
adj AS (
    SELECT lo AS node, hi AS nbr FROM ue
    UNION ALL
    SELECT hi, lo FROM ue
),
gnodes AS (
    SELECT DISTINCT node FROM (
        SELECT node FROM adj UNION ALL SELECT nbr FROM adj
    )
),
s0 AS (
    SELECT node,
           ({_H}) % {ANF_M} AS bucket,
           CASE WHEN ({_H}) // {ANF_M} = 0 THEN {ANF_RHO0}
                ELSE {ANF_RHO0} - length(bin(({_H}) // {ANF_M})) END AS rho
    FROM gnodes
),
s1 AS (
    SELECT node, bucket, max(rho) AS rho FROM (
        SELECT node, bucket, rho FROM s0
        UNION ALL
        SELECT a.node, s.bucket, s.rho FROM adj a JOIN s0 s ON s.node = a.nbr
    ) GROUP BY node, bucket
),
s2 AS (
    SELECT node, bucket, max(rho) AS rho FROM (
        SELECT node, bucket, rho FROM s1
        UNION ALL
        SELECT a.node, s.bucket, s.rho FROM adj a JOIN s1 s ON s.node = a.nbr
    ) GROUP BY node, bucket
),
per AS (
    SELECT node, count(*) AS npresent,
           sum(1::BIGINT << CAST({ANF_RHO0} - rho AS INT)) AS s
    FROM s2 GROUP BY node
),
node_est AS (
    SELECT node,
           round(1000 * CASE
               WHEN ({ANF_ALPHA} * {float(ANF_M * ANF_M * ANF_POW)}
                     / (s + ({ANF_M} - npresent) * {ANF_POW})) <= {2.5 * ANF_M}
                    AND ({ANF_M} - npresent) > 0
               THEN {float(ANF_M)} * ln({float(ANF_M)} / ({ANF_M} - npresent))
               ELSE {ANF_ALPHA} * {float(ANF_M * ANF_M * ANF_POW)}
                    / (s + ({ANF_M} - npresent) * {ANF_POW})
           END)::BIGINT AS est_milli
    FROM per
),
two_hop AS (
    SELECT a.node, b.nbr FROM adj a JOIN adj b ON a.nbr = b.node
),
ball AS (
    SELECT DISTINCT node, nbr FROM (
        SELECT node, nbr FROM adj
        UNION ALL
        SELECT node, nbr FROM two_hop
    ) WHERE node <> nbr
),
b2 AS (SELECT node, count(*)::BIGINT AS ball2 FROM ball GROUP BY node),
j AS (
    SELECT e.node, (coalesce(b.ball2, 0) + 1)::BIGINT AS ball2p1, e.est_milli
    FROM node_est e LEFT JOIN b2 b USING (node)
)
SELECT ball2p1,
       count(*)::BIGINT AS n_nodes,
       sum(est_milli)::BIGINT AS sum_est_milli,
       (ball2p1 * count(*))::BIGINT AS exact_total
FROM j
GROUP BY ball2p1
ORDER BY ball2p1
"""
)


QUERIES = {"anf_reach": q_anf_reach}

ORACLES = {"anf_reach": _ANF_SQL}
