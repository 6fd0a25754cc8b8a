"""Graph cohesion ratios, batch 109: per-node local clustering
coefficient and global transitivity over the undirected closure of the
modular link graph — the Watts–Strogatz small-world readouts that
``triangles`` (a global count over the LSH candidate graph) and
``kcore``/``degree_dist`` (local density) don't provide.

Scale design (100 TB):
- Triangle enumeration is the compact-forward plan ``triangles``
  already uses: edges stored once as (a < b), wedges by the
  (a,b)⋈(b,c) middle-vertex equi-join, closed by a left-semi against
  (a,c) — join input bounded by the wedge count, degree-ordering caps
  hubs at web scale. Per-NODE credit: each found triangle {a<b<c}
  explodes to its three corners (map-side, 3× fan-out) and one keyed
  count gives tri(v).
- ``clustering_coeff``: cc(v) = tri(v)/C(deg(v),2) emitted as the
  exact integer pair (2·tri(v), deg(v)·(deg(v)−1)) plus its one
  division; degree-1 nodes carry (0, 0) and a NULL float — no
  divide-by-zero, no fake zeros.
- ``transitivity``: the one-row global ratio 3·triangles/wedges as
  exact integers (Σ_v C(deg(v),2) wedges from the degree table, never
  enumerated) + one division. Exactly the quantity whose denominator
  the wedge join above is bounded by — the audit you run BEFORE
  committing to a triangle join at 10^12 edges.

Reference parity: no graph layer in the reference; completes the
cohesion family (triangles, edge_support, k_truss, kcore).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .brandesops import _dedges


def _uedges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected closure as canonical (lo < hi) pairs, deduplicated."""
    e = _dedges(spark, sf_dir)
    return (
        e.select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )


def _tri_corners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, tri) per-node triangle counts via compact-forward."""
    ue = _uedges(spark, sf_dir).localCheckpoint(eager=False)
    ab = ue.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = ue.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    wedges = ab.join(bc, "b")
    tris = wedges.join(
        ue, (wedges.a == ue.lo) & (wedges.c == ue.hi), "left_semi"
    )
    corners = tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("tri"))


def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per node: degree, triangle count, exact cc rational + float
    (module doc)."""
    ue = _uedges(spark, sf_dir)
    deg = (
        ue.select(F.col("lo").alias("node"))
        .unionByName(ue.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = _tri_corners(spark, sf_dir)
    j = deg.join(tri, "node", "left").select(
        "node",
        "deg",
        F.coalesce("tri", F.lit(0)).alias("tri"),
    )
    den = F.col("deg") * (F.col("deg") - 1)
    return j.select(
        F.col("node").cast("long").alias("node"),
        F.col("deg").cast("long").alias("deg"),
        F.col("tri").cast("long").alias("tri"),
        (2 * F.col("tri")).cast("long").alias("cc_num"),
        den.cast("long").alias("cc_den"),
        F.when(
            den > 0, (2 * F.col("tri")).cast("double") / den.cast("double")
        ).alias("cc"),
    ).orderBy("node")


def q_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: 3·triangles / wedges as exact integers + float."""
    ue = _uedges(spark, sf_dir)
    deg = (
        ue.select(F.col("lo").alias("node"))
        .unionByName(ue.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    wedges = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("long").alias(
            "n_wedges"
        ),
        F.count(F.lit(1)).alias("n_nodes"),
    )
    tris = _tri_corners(spark, sf_dir).agg(
        (F.sum("tri") / 3).cast("long").alias("n_tri")
    )
    return wedges.crossJoin(F.broadcast(tris)).select(
        "n_nodes",
        "n_wedges",
        "n_tri",
        (3 * F.col("n_tri")).cast("long").alias("trans_num"),
        F.col("n_wedges").cast("long").alias("trans_den"),
        (
            (3 * F.col("n_tri")).cast("double")
            / F.col("n_wedges").cast("double")
        ).alias("transitivity"),
    )


def _edges_sql_prefix() -> str:
    from .graphstats2 import _GRAPH_SQL

    return f"""
WITH {_GRAPH_SQL},
ue AS (
    SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
    FROM edges WHERE src <> dst
),
deg AS (
    SELECT node, count(*)::BIGINT AS deg FROM (
        SELECT lo AS node FROM ue UNION ALL SELECT hi FROM ue
    ) GROUP BY node
),
tris AS (
    SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
    FROM ue ab
    JOIN ue bc ON bc.lo = ab.hi
    SEMI JOIN ue cl ON cl.lo = ab.lo AND cl.hi = bc.hi
),
corners AS (
    SELECT node, count(*)::BIGINT AS tri FROM (
        SELECT a AS node FROM tris
        UNION ALL SELECT b FROM tris
        UNION ALL SELECT c FROM tris
    ) GROUP BY node
)
"""


_CC_SQL = (
    _edges_sql_prefix()
    + """
SELECT deg.node::BIGINT AS node, deg.deg,
       COALESCE(corners.tri, 0)::BIGINT AS tri,
       (2 * COALESCE(corners.tri, 0))::BIGINT AS cc_num,
       (deg.deg * (deg.deg - 1))::BIGINT AS cc_den,
       CASE WHEN deg.deg > 1
            THEN CAST(2 * COALESCE(corners.tri, 0) AS DOUBLE)
                 / CAST(deg.deg * (deg.deg - 1) AS DOUBLE)
       END AS cc
FROM deg LEFT JOIN corners ON corners.node = deg.node
ORDER BY node
"""
)

_TRANS_SQL = (
    _edges_sql_prefix()
    + """
, w AS (
    SELECT CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges,
           count(*)::BIGINT AS n_nodes
    FROM deg
),
t AS (SELECT CAST(sum(tri) / 3 AS BIGINT) AS n_tri FROM corners)
SELECT n_nodes, n_wedges, n_tri,
       (3 * n_tri)::BIGINT AS trans_num,
       n_wedges::BIGINT AS trans_den,
       CAST(3 * n_tri AS DOUBLE) / CAST(n_wedges AS DOUBLE)
           AS transitivity
FROM w CROSS JOIN t
"""
)


QUERIES = {
    "clustering_coeff": q_clustering_coeff,
    "transitivity": q_transitivity,
}

ORACLES = {
    "clustering_coeff": _CC_SQL,
    "transitivity": _TRANS_SQL,
}
