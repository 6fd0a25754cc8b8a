"""Spanning-tree surface, batch 74: distributed Borůvka minimum
spanning forest over the weighted doc link graph, plus the per-node
minimum-incident-edge primitive (Borůvka's inner step) as a strict
cross-engine oracle.

Scale design (100 TB):
- ``min_incident_edge``: one union (both edge directions) + one keyed
  min-aggregation on a (w, lo, hi) struct — pure map-side partial agg,
  the cheapest possible shape. This is exactly the per-component
  selection step Borůvka iterates, so its strict DuckDB oracle also
  pins the tie-break semantics the full algorithm relies on.
- ``boruvka_msf``: the textbook O(log V)-round parallel MSF
  (Borůvka 1926; the GraphX/Pregel formulation). Per round:
  (1) relabel edge endpoints by component (two keyed equi-joins),
  (2) drop intra-component edges,
  (3) per-component minimum outgoing edge via groupBy-min on the
      (w, lo, hi) struct — map-side partial agg, never all-pairs,
  (4) contract: hash-min label propagation WITH ONE POINTER JUMP
      (lbl := min(lbl, lbl[lbl])) per sweep on the component
      multigraph induced by the selected edges — the jump at least
      halves the distance-to-minimum each sweep, so the fixpoint
      arrives in O(log diameter) sweeps instead of O(diameter). The
      graph has at most one edge per live component (component-count-
      sized, geometrically shrinking); change detection is ONE
      1-row agg per sweep. Loop state severs through parquet scratch
      staging (``_stage``), not ``localCheckpoint`` — see _stage's
      docstring for the measured checkpoint pathology this avoids.
  The strict total order (w, lo, hi) makes edge weights effectively
  distinct, so the MSF is UNIQUE (standard exchange argument) and an
  independent pure-Python Kruskal with union-find is a bit-exact
  golden oracle — the ``stable_matching`` pattern (matchops.py).
  Nothing node-sized ever reaches the driver; per-round cost is a
  constant number of keyed joins/aggs over data that shrinks 2× per
  round. At 10^12 edges this is the standard log²V-job MSF plan.

Edge weights are the deterministic integer hash
``(lo*48271 + hi*16807) % 9973 + 1`` computed identically in Spark,
DuckDB, and the Python oracle — no float crosses engines.

Reference parity: no graph layer in the reference; completes the
graph-algorithm family (pagerank, connected components, triangles,
k-truss, trustrank, pointer-doubling) with the classic weighted
optimization primitive used for clustering dedup graphs (single-link
clustering IS the MSF cut at a threshold).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .linkpred import _EDGES_SQL, _undirected_edges
from .util import gold_tag, scratch_new_gen, scratch_stage

MSF_ROUNDS = 24  # > log2(max component count) at any test sf
_CONTRACT_SWEEPS = 40  # fixpoint guard; loop exits on no-change


def _weighted_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The undirected modular link graph with the deterministic
    integer weight hash (module docstring)."""
    ue = _undirected_edges(spark, sf_dir)
    w = (F.col("lo") * 48271 + F.col("hi") * 16807) % 9973 + 1
    return ue.select("lo", "hi", w.cast("long").alias("w"))


_WEIGHTED_SQL = (
    _EDGES_SQL
    + """,
    we AS (
        SELECT lo, hi, (lo*48271 + hi*16807) % 9973 + 1 AS w FROM ue
    )
"""
)


def q_min_incident_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per node, its minimum incident edge under the strict
    (w, lo, hi) order — Borůvka's selection step as a standalone,
    strictly-oracled primitive."""
    e = _weighted_edges(spark, sf_dir)
    pick = F.struct(F.col("w"), F.col("lo"), F.col("hi"))
    inc = e.select(F.col("lo").alias("node"), pick.alias("e")).unionByName(
        e.select(F.col("hi").alias("node"), pick.alias("e"))
    )
    return inc.groupBy("node").agg(F.min("e").alias("m")).select(
        "node",
        F.col("m.w").alias("w"),
        F.col("m.lo").alias("lo"),
        F.col("m.hi").alias("hi"),
    )


# DuckDB min_by has no struct ordering — encode the strict (w, lo, hi)
# order as one scalar: keys < 10^6 at every test sf (doc_id < 5000),
# w <= 9973, so the encoding stays far under 2^63 (matchops precedent).
_MIN_INCIDENT_SQL = (
    _WEIGHTED_SQL
    + """,
    inc AS (
        SELECT lo AS node, w, lo, hi FROM we
        UNION ALL
        SELECT hi, w, lo, hi FROM we
    )
    SELECT node::BIGINT AS node,
           min_by(w, (w*1000000 + lo)*1000000 + hi)::BIGINT AS w,
           min_by(lo, (w*1000000 + lo)*1000000 + hi)::BIGINT AS lo,
           min_by(hi, (w*1000000 + lo)*1000000 + hi)::BIGINT AS hi
    FROM inc GROUP BY node
"""
)



def q_boruvka_msf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Borůvka minimum spanning forest (module docstring).
    Unique under the strict (w, lo, hi) order; golden-oracled by an
    independent pure-Python Kruskal."""
    for _tag in ("e", "comp", "sel", "msf", "ce", "lbl", "lblswp"):
        scratch_new_gen(_tag)  # reclaim the previous invocation's scratch
    e = scratch_stage(_weighted_edges(spark, sf_dir), "e")
    comp = scratch_stage(
        e.select(F.col("lo").alias("id"))
        .unionByName(e.select(F.col("hi").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("comp")),
        "comp",
    )
    msf: DataFrame | None = None
    for _ in range(MSF_ROUNDS):
        ec = (
            e.join(
                comp.select(F.col("id").alias("lo"), F.col("comp").alias("clo")),
                "lo",
            )
            .join(
                comp.select(F.col("id").alias("hi"), F.col("comp").alias("chi")),
                "hi",
            )
            .filter(F.col("clo") != F.col("chi"))
        )
        pick = F.struct(
            F.col("w"), F.col("lo"), F.col("hi"), F.col("clo"), F.col("chi")
        )
        cand = ec.select(F.col("clo").alias("c"), pick.alias("e")).unionByName(
            ec.select(F.col("chi").alias("c"), pick.alias("e"))
        )
        sel = scratch_stage(
            cand.groupBy("c")
            .agg(F.min("e").alias("m"))
            .select("m.*")
            .distinct(),
            "sel",
        )
        if sel.isEmpty():
            break
        picked = sel.select("lo", "hi", "w")
        msf = scratch_stage(
            picked
            if msf is None
            else msf.unionByName(picked).distinct(),
            "msf",
        )
        # Contract: hash-min to fixpoint on the component multigraph.
        ce = sel.select(F.col("clo").alias("a"), F.col("chi").alias("b"))
        ce = scratch_stage(
            ce.unionByName(
                ce.select(F.col("b").alias("a"), F.col("a").alias("b"))
            ).distinct(),
            "ce",
        )
        lbl = scratch_stage(
            comp.select(F.col("comp").alias("cid"))
            .distinct()
            .select("cid", F.col("cid").alias("lbl")),
            "lbl",
        )
        for _sweep in range(_CONTRACT_SWEEPS):
            # hash-min sweep + ONE pointer jump (lbl := lbl[lbl]) per
            # sweep: the jump makes distance-to-minimum at least halve
            # each sweep, so fixpoint arrives in O(log diameter) sweeps
            # instead of O(diameter). One ACTION per sweep (the change
            # count materializes the persisted next label table) — the
            # old per-sweep localCheckpoint + isEmpty pair cost 2-3
            # full jobs each and dominated wall time at sf0.1 (433 s →
            # the r4 fix; data here is component-sized, job overhead
            # is the cost).
            nb = (
                ce.join(
                    lbl.select(F.col("cid").alias("a"), F.col("lbl").alias("la")),
                    "a",
                )
                .groupBy("b")
                .agg(F.min("la").alias("mn"))
            )
            stepped = (
                lbl.join(nb, lbl.cid == nb.b, "left")
                .select(
                    "cid",
                    F.col("lbl").alias("old"),
                    F.least(
                        "lbl", F.coalesce("mn", F.col("lbl"))
                    ).alias("mid"),
                )
            )
            jump = stepped.select(
                F.col("cid").alias("jcid"), F.col("mid").alias("jlbl")
            )
            new = (
                stepped.join(jump, stepped.mid == jump.jcid, "left")
                .select(
                    "cid",
                    "old",
                    F.least(
                        "mid", F.coalesce("jlbl", F.col("mid"))
                    ).alias("lbl"),
                )
            )
            if _sweep % 2 == 1:  # sever every 2nd sweep: plan depth
                # stays <= 2 self-join doublings, half the write jobs
                new = scratch_stage(new, "lblswp")
            n_changed = new.agg(
                F.sum((F.col("lbl") != F.col("old")).cast("long"))
            ).collect()[0][0]
            lbl = new.drop("old")
            if not n_changed:
                break
        comp = scratch_stage(
            comp.join(lbl, comp.comp == lbl.cid)
            .select("id", F.col("lbl").alias("comp")),
            "comp",
        )

    assert msf is not None
    return msf.select(
        F.col("lo").cast("long").alias("lo"),
        F.col("hi").cast("long").alias("hi"),
        F.col("w").cast("long").alias("w"),
    )


def _py_weighted_edges(sf_dir: str) -> list[tuple[int, int, int]]:
    """Pure-Python recomputation of the weighted link graph from first
    principles (doc_ids → modular edges → weight hash) — fully
    independent of the Spark plan."""
    import glob

    import pandas as pd

    files = sorted(glob.glob(f"{sf_dir}/documents.parquet")) or sorted(
        glob.glob(f"{sf_dir}/documents.parquet/*.parquet")
    )
    ids = pd.concat(
        [pd.read_parquet(f, columns=["doc_id"]) for f in files]
    )["doc_id"].astype(int).tolist()
    n = len(ids)
    pairs = set()
    for i in ids:
        raw = []
        if i % 3 != 0:
            raw.append((i, (i * 2 + 1) % n))
        if i % 2 == 0:
            raw.append((i, (i * 7 + 3) % n))
        if i % 6 == 1:
            raw.append((i, (i + n // 2) % n))
        for a, b in raw:
            if a != b:
                pairs.add((min(a, b), max(a, b)))
    return sorted(
        (w, lo, hi)
        for lo, hi in pairs
        for w in ((lo * 48271 + hi * 16807) % 9973 + 1,)
    )


def _py_kruskal(weighted: list[tuple[int, int, int]]) -> list[tuple]:
    """Textbook Kruskal with union-find under the strict (w, lo, hi)
    order — the independent MSF oracle."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    out = []
    for w, lo, hi in sorted(weighted):
        ra, rb = find(lo), find(hi)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            out.append((lo, hi, w))
    return sorted(out)


def _staged_msf_gold(sf_dir: str | None = None) -> str:
    """Golden MSF from the independent Kruskal, staged per sf dir."""
    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )

    import pandas as pd

    tag = gold_tag(sf_dir, __name__)
    p = f"/tmp/ocr2csv_msf_gold_{tag}.parquet"
    if not os.path.exists(p):
        rows = _py_kruskal(_py_weighted_edges(sf_dir))
        pd.DataFrame(rows, columns=["lo", "hi", "w"]).to_parquet(
            p, index=False
        )
    return p


def _msf_oracle_sql(sf_dir: str | None = None) -> str:
    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    gold = _staged_msf_gold(sf_dir)
    return f"""
        SELECT lo::BIGINT AS lo, hi::BIGINT AS hi, w::BIGINT AS w
        FROM '{gold}'
    """


QUERIES = {
    "min_incident_edge": q_min_incident_edge,
    "boruvka_msf": q_boruvka_msf,
}

ORACLES = {
    "min_incident_edge": _MIN_INCIDENT_SQL,
    "boruvka_msf": _msf_oracle_sql(),
}
