"""Replicated state, batch 165: G-counter and OR-set CRDT convergence
audits — the eventual-consistency primitives behind multi-region
ingest (counters that merge by elementwise max; sets where concurrent
add wins), simulated over deterministic replica assignments and
PROVEN convergent on the data.

Scale design (100 TB):
- ``crdt_gcounter``: every event hashes to one of R=5 replicas (its
  "home" — the only slot it may increment); each replica has also
  gossiped a deterministic PREFIX fraction of every other replica's
  increments. The R local vectors and their elementwise-max merge are
  computed from ONE keyed count (R² bounded expressions on the pivot).
  The CRDT guarantee — the merge equals the true per-replica totals
  no matter how stale the gossip — is the audit, pinned per slot.
- ``crdt_orset``: per element (part % 64), adds and removes are
  deterministic slices of the lineitem stream with orderkey tags; a
  remove covers exactly the add-tags causally before it (lower
  orderkey). Merged membership = some add-tag survives every remove
  (max add tag > max remove tag) — the "concurrent add wins"
  semantics; emitted per element with add/remove counts and mirrored
  exactly.

Reference parity: no replication layer in the reference; extends
merkle_diff (anti-entropy repair), hll_merge (mergeable sketches),
scd2/bitemporal_asof (versioned state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import DUCK_HEX32, hex32, table

R_REPLICAS = 5
OR_ELEMS = 64


def q_crdt_gcounter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per replica slot (module doc): (slot, n_true, merged,
    min_observed, converged)."""
    e = table(spark, sf_dir, "events")
    home = (
        hex32(F.concat(F.lit("gc|"), F.col("event_id").cast("string")))
        % R_REPLICAS
    )
    counts = e.groupBy(home.alias("slot")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    aggs = []
    for s in range(R_REPLICAS):
        aggs.append(
            F.sum(F.when(F.col("slot") == s, F.col("n")).otherwise(0))
            .cast("long")
            .alias(f"n_{s}")
        )
    piv = counts.agg(*aggs)
    # replica r's view of slot s: full if r == s else a gossip prefix
    # floor(n_s * f_rs / 100) with f_rs = md5-derived in [0, 100)
    import hashlib

    def frac(r, s):
        return (
            int(hashlib.md5(f"gs|{r}|{s}".encode()).hexdigest()[:8], 16)
            % 100
        )

    rows = []
    for s in range(R_REPLICAS):
        views = [
            F.col(f"n_{s}")
            if r == s
            else F.expr(f"(n_{s} * {frac(r, s)}) div 100")
            for r in range(R_REPLICAS)
        ]
        merged = views[0]
        observed_min = views[0]
        for v in views[1:]:
            merged = F.greatest(merged, v)
            observed_min = F.least(observed_min, v)
        rows.append(
            F.struct(
                F.lit(s).cast("long").alias("slot"),
                F.col(f"n_{s}").alias("n_true"),
                merged.cast("long").alias("merged"),
                observed_min.cast("long").alias("min_observed"),
            )
        )
    return (
        piv.select(F.explode(F.array(*rows)).alias("r"))
        .select(
            "r.slot",
            "r.n_true",
            "r.merged",
            "r.min_observed",
            (F.col("r.merged") == F.col("r.n_true")).cast("long").alias(
                "converged"
            ),
        )
        .orderBy("slot")
    )


def q_crdt_orset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per element (module doc): (elem, n_adds, n_removes, max_add_tag,
    max_rm_tag, member)."""
    li = table(spark, sf_dir, "lineitem")
    elem = (F.col("l_partkey") % OR_ELEMS).alias("elem")
    is_add = (
        hex32(
            F.concat(
                F.lit("or|"),
                F.col("l_orderkey").cast("string"),
                F.lit("|"),
                F.col("l_linenumber").cast("string"),
            )
        )
        % 3
        != 0
    )  # 2/3 adds, 1/3 removes
    ops = li.select(
        elem,
        F.col("l_orderkey").cast("long").alias("tag"),
        is_add.cast("long").alias("is_add"),
    )
    per = ops.groupBy("elem").agg(
        F.sum("is_add").cast("long").alias("n_adds"),
        F.sum(1 - F.col("is_add")).cast("long").alias("n_removes"),
        F.max(F.when(F.col("is_add") == 1, F.col("tag"))).alias(
            "max_add_tag"
        ),
        F.max(F.when(F.col("is_add") == 0, F.col("tag"))).alias(
            "max_rm_tag"
        ),
    )
    return per.select(
        "elem",
        "n_adds",
        "n_removes",
        F.coalesce("max_add_tag", F.lit(-1)).cast("long").alias(
            "max_add_tag"
        ),
        F.coalesce("max_rm_tag", F.lit(-1)).cast("long").alias(
            "max_rm_tag"
        ),
        (
            F.coalesce("max_add_tag", F.lit(-1))
            > F.coalesce("max_rm_tag", F.lit(-1))
        ).cast("long").alias("member"),
    ).orderBy("elem")


def _gc_sql() -> str:
    import hashlib

    def frac(r, s):
        return (
            int(hashlib.md5(f"gs|{r}|{s}".encode()).hexdigest()[:8], 16)
            % 100
        )

    h = DUCK_HEX32.format(x="'gc|' || event_id::VARCHAR")
    aggs = ", ".join(
        f"sum(CASE WHEN slot = {s} THEN n ELSE 0 END)::BIGINT AS n_{s}"
        for s in range(R_REPLICAS)
    )
    sels = []
    for s in range(R_REPLICAS):
        views = [
            f"n_{s}" if r == s else f"((n_{s} * {frac(r, s)}) // 100)"
            for r in range(R_REPLICAS)
        ]
        merged = "greatest(" + ", ".join(views) + ")"
        vmin = "least(" + ", ".join(views) + ")"
        sels.append(
            f"SELECT {s}::BIGINT AS slot, n_{s} AS n_true, "
            f"({merged})::BIGINT AS merged, ({vmin})::BIGINT AS "
            f"min_observed, (({merged}) = n_{s})::BIGINT AS converged "
            f"FROM piv"
        )
    return f"""
WITH counts AS (
    SELECT ({h}) % {R_REPLICAS} AS slot, count(*)::BIGINT AS n
    FROM events GROUP BY 1
),
piv AS (SELECT {aggs} FROM counts)
{' UNION ALL '.join(sels)}
ORDER BY slot
"""


_OR_SQL = f"""
WITH ops AS (
    SELECT l_partkey % {OR_ELEMS} AS elem,
           l_orderkey::BIGINT AS tag,
           (CASE WHEN ({DUCK_HEX32.format(
               x="'or|' || l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR"
           )}) % 3 <> 0 THEN 1 ELSE 0 END)::BIGINT AS is_add
    FROM lineitem
),
per AS (
    SELECT elem,
           sum(is_add)::BIGINT AS n_adds,
           sum(1 - is_add)::BIGINT AS n_removes,
           max(CASE WHEN is_add = 1 THEN tag END) AS max_add_tag,
           max(CASE WHEN is_add = 0 THEN tag END) AS max_rm_tag
    FROM ops GROUP BY elem
)
SELECT elem::BIGINT AS elem, n_adds, n_removes,
       coalesce(max_add_tag, -1)::BIGINT AS max_add_tag,
       coalesce(max_rm_tag, -1)::BIGINT AS max_rm_tag,
       (coalesce(max_add_tag, -1) > coalesce(max_rm_tag, -1))::BIGINT
           AS member
FROM per
ORDER BY elem
"""

QUERIES = {
    "crdt_gcounter": q_crdt_gcounter,
    "crdt_orset": q_crdt_orset,
}

ORACLES = {
    "crdt_gcounter": _gc_sql(),
    "crdt_orset": _OR_SQL,
}
