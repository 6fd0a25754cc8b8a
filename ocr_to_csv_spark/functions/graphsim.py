"""Graph similarity/centrality, batch 135: Katz centrality (attenuated
walk counts) and SimRank (structural node similarity) over the shared
synthesized link graph — the walk-weighted ranking next to
pagerank/hits, and the "two pages are similar if similar pages link to
them" signal behind related-page retrieval.

Scale design (100 TB):
- ``katz_centrality``: with attenuation α = 1/8 the whole iteration is
  EXACT int64 — s_{r+1}(v) = Σ_{u→v} (s_r(u) + 8^r) keeps
  s_R(v) = Σ_k (#walks of length k into v)·8^(R-k), i.e. Katz scaled
  by 8^R, no floats anywhere. K=4 rounds, each ONE edges⋈state
  equi-join + ONE keyed sum (the hits/pagerank discipline); degrees
  are ≤3 so int64 has ~15 orders of headroom. Output is the top-20
  under the total order (katz desc, doc_id) — bounded.
- ``simrank``: pairwise state starts at the diagonal and stays SPARSE
  — a pair (a,b) only enters when an in-neighbor pair already scored,
  so round r holds pairs within distance r of the diagonal (in-degrees
  ≤3 cap the fanout at 9× per round), never the dense n² matrix. Each
  round: state ⋈ edges ⋈ edges (two equi-joins on the pair's
  endpoints), ONE (a,b) keyed sum, then the exact integer update
  s' = (4·Σ) div (5·indeg_a·indeg_b) in SCALE=10^6 units (C=0.8;
  positive integer div is floor on both engines, mirrored by the
  oracle verbatim). Diagonal re-pinned to SCALE each round per the
  SimRank fixpoint definition; edges deduplicated (set semantics).

Reference parity: no graph layer in the reference; extends the link
family (pagerank textops.py:630, hits/label_prop graphtext.py, trustrank
graphstats.py:338, modularity_score webgraph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .graphtext import _edges
from .util import table

KATZ_ROUNDS = 4
SR_ROUNDS = 2
SR_SCALE = 1_000_000
KATZ_TOP = 20
SR_TOP = 15


def _graph(spark: SparkSession, sf_dir: str):
    d = table(spark, sf_dir, "documents", spread=True)
    n = d.count()
    nodes = d.select(F.col("doc_id").cast("long").alias("id"))
    return nodes, _edges(nodes, n)


def q_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-KATZ_TOP nodes by exact 8^R-scaled Katz centrality (module
    doc): (doc_id, katz_scaled)."""
    nodes, edges = _graph(spark, sf_dir)
    s = nodes.select("id", F.lit(0).cast("long").alias("s"))
    for r in range(KATZ_ROUNDS):
        agg = (
            edges.join(s.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("s") + F.lit(8**r).cast("long")).alias("s"))
            .withColumnRenamed("dst", "id")
        )
        s = nodes.join(agg, "id", "left").select(
            "id", F.coalesce("s", F.lit(0)).cast("long").alias("s")
        )
    return (
        s.orderBy(F.col("s").desc(), "id")
        .limit(KATZ_TOP)
        .select(F.col("id").alias("doc_id"), F.col("s").alias("katz_scaled"))
    )


def q_simrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-SR_TOP non-diagonal SimRank pairs in SCALE units (module
    doc): (doc_a < doc_b, sim_scaled)."""
    nodes, edges = _graph(spark, sf_dir)
    edges = edges.distinct()
    indeg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("ind"))
    s = nodes.select(
        F.col("id").alias("u"),
        F.col("id").alias("v"),
        F.lit(SR_SCALE).cast("long").alias("s"),
    )
    diag = s
    e1 = edges.select(F.col("src").alias("u"), F.col("dst").alias("a"))
    e2 = edges.select(F.col("src").alias("v"), F.col("dst").alias("b"))
    for _ in range(SR_ROUNDS):
        nxt = (
            s.join(e1, "u")
            .join(e2, "v")
            .filter(F.col("a") != F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum("s").alias("tot"))
            .join(indeg.select(F.col("dst").alias("a"),
                               F.col("ind").alias("ia")), "a")
            .join(indeg.select(F.col("dst").alias("b"),
                               F.col("ind").alias("ib")), "b")
            .select(
                F.col("a").alias("u"),
                F.col("b").alias("v"),
                F.expr("(4 * tot) div (5 * ia * ib)").cast("long").alias("s"),
            )
            .filter(F.col("s") > 0)
        )
        s = diag.unionByName(nxt)
    return (
        s.filter(F.col("u") < F.col("v"))
        .orderBy(F.col("s").desc(), "u", "v")
        .limit(SR_TOP)
        .select(
            F.col("u").alias("doc_a"),
            F.col("v").alias("doc_b"),
            F.col("s").alias("sim_scaled"),
        )
    )


_GRAPH_CTE = """
nodes AS (SELECT doc_id::BIGINT AS id FROM documents),
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
edges AS (
    SELECT id AS src, (id*2+1) % (SELECT n FROM nn) AS dst
    FROM nodes WHERE id % 3 <> 0
    UNION ALL
    SELECT id, (id*7+3) % (SELECT n FROM nn) FROM nodes WHERE id % 2 = 0
    UNION ALL
    SELECT id, (id + (SELECT n FROM nn) // 2) % (SELECT n FROM nn)
    FROM nodes WHERE id % 6 = 1
)"""


def _katz_sql() -> str:
    rounds = []
    prev = "s0"
    for r in range(KATZ_ROUNDS):
        rounds.append(
            f"s{r + 1} AS (SELECT n.id, coalesce(t.s, 0)::BIGINT AS s "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS id, sum(p.s + {8**r})::BIGINT AS s "
            f"FROM edges e JOIN {prev} p ON p.id = e.src GROUP BY e.dst"
            f") t ON t.id = n.id)"
        )
        prev = f"s{r + 1}"
    return f"""
WITH {_GRAPH_CTE},
s0 AS (SELECT id, 0::BIGINT AS s FROM nodes),
{', '.join(rounds)}
SELECT id AS doc_id, s AS katz_scaled
FROM {prev}
ORDER BY s DESC, id
LIMIT {KATZ_TOP}
"""


def _simrank_sql() -> str:
    rounds = []
    prev = "p0"
    for r in range(SR_ROUNDS):
        rounds.append(
            f"p{r + 1} AS ("
            f"SELECT u, v, s FROM diag UNION ALL "
            f"SELECT t.a AS u, t.b AS v, "
            f"(4 * t.tot) // (5 * ia.ind * ib.ind) AS s "
            f"FROM (SELECT e1.dst AS a, e2.dst AS b, sum(p.s)::BIGINT AS tot"
            f" FROM {prev} p"
            f" JOIN de e1 ON e1.src = p.u JOIN de e2 ON e2.src = p.v"
            f" WHERE e1.dst <> e2.dst GROUP BY e1.dst, e2.dst) t"
            f" JOIN indeg ia ON ia.dst = t.a JOIN indeg ib ON ib.dst = t.b"
            f" WHERE (4 * t.tot) // (5 * ia.ind * ib.ind) > 0)"
        )
        prev = f"p{r + 1}"
    return f"""
WITH {_GRAPH_CTE},
de AS (SELECT DISTINCT src, dst FROM edges),
indeg AS (SELECT dst, count(*)::BIGINT AS ind FROM de GROUP BY dst),
diag AS (SELECT id AS u, id AS v, {SR_SCALE}::BIGINT AS s FROM nodes),
p0 AS (SELECT u, v, s FROM diag),
{', '.join(rounds)}
SELECT u AS doc_a, v AS doc_b, s AS sim_scaled
FROM {prev}
WHERE u < v
ORDER BY s DESC, u, v
LIMIT {SR_TOP}
"""


QUERIES = {
    "katz_centrality": q_katz_centrality,
    "simrank": q_simrank,
}

ORACLES = {
    "katz_centrality": _katz_sql(),
    "simrank": _simrank_sql(),
}
