"""Data-ops batch 34: incremental JOIN-view maintenance and the
l-diversity release gate.

Scale design (100 TB):
- ``ivm_join`` is the materialized-view delta algebra for a JOIN view —
  the other half of what ``incremental_agg`` proves for aggregates.
  When base tables A (orders) and B (lineitem) each receive a delta,
  the view refresh is  ΔV = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB  merged into V₀ by
  one state-sized keyed aggregate. Every delta term has a DELTA-SIZED
  side (probe-side pruned at the scan — the whole point: refreshing a
  10^12-row join view after a 0.1% ingest touches ~0.1% of the work of
  a rebuild; history is re-JOINED only against deltas, never re-joined
  against itself). The DuckDB oracle is the full rebuild over the
  complete tables — equality IS the correctness contract of the delta
  decomposition (the three terms partition the new pairs exactly: base
  splits are disjoint, so no pair is produced twice).
- ``l_diversity`` completes the privacy-gate family next to
  ``k_anon_audit``: k-anonymity bounds re-identification but a class
  can be k-large yet expose everyone's sensitive value if that value is
  constant within the class. Per quasi-identifier class, distinct
  sensitive values < l ⇒ violation. Two map-side-combinable aggregates
  (dedup on (QI, sensitive), then count per QI); violating classes are
  by construction the low-diversity ones, so the output is tiny at any
  row count.

Reference parity: the reference has no warehouse/governance layer;
these extend SURVEY.md §2 A/J families like ``dataops.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import DUCK_HEX32, hex32, table

IVM_MOD = 10  # ~10% of each base table arrives as the delta
L_DIVERSITY = 3
L_DIV_BAND = 200_000  # cents → 2000-currency-unit balance bands


def q_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer revenue view over orders⋈lineitem, maintained
    incrementally: V₀ from the base partitions plus the three delta
    terms, merged by one keyed sum. Oracle = full rebuild."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        hex32(F.col("o_orderkey").cast("string")).alias("_ho"),
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        hex32(
            F.concat(
                F.col("l_orderkey").cast("string"),
                F.lit("|"),
                F.col("l_linenumber").cast("string"),
            )
        ).alias("_hl"),
    )
    a0 = o.filter(F.col("_ho") % IVM_MOD != 0)
    da = o.filter(F.col("_ho") % IVM_MOD == 0)
    b0 = li.filter(F.col("_hl") % IVM_MOD != 0)
    db = li.filter(F.col("_hl") % IVM_MOD == 0)

    def part(left: DataFrame, right: DataFrame) -> DataFrame:
        return (
            left.join(right, left.o_orderkey == right.l_orderkey)
            .groupBy("o_custkey")
            .agg(F.sum("cents").alias("pc"), F.count("*").alias("pn"))
        )

    v0 = part(a0, b0)
    merged = v0.unionByName(part(da, b0)).unionByName(
        part(a0, db)
    ).unionByName(part(da, db))
    return (
        merged.groupBy("o_custkey")
        .agg(F.sum("pc").alias("revenue_cents"), F.sum("pn").alias("n_lines"))
        .select(
            F.col("o_custkey").cast("long").alias("o_custkey"),
            "revenue_cents", "n_lines",
        )
    )


_HO = DUCK_HEX32.format(x="CAST(o_orderkey AS VARCHAR)")
_HL = DUCK_HEX32.format(
    x="(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR))"
)

_IVM_SQL = f"""
    SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents,
           count(*) AS n_lines
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_custkey
"""


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: quasi-identifier classes (nation,
    balance band) whose distinct market segments number < l."""
    c = table(spark, sf_dir, "customer")
    band = F.floor(
        F.round(F.col("c_acctbal") * 100).cast("long") / L_DIV_BAND
    ).cast("long")
    qi_sens = c.select(
        F.col("c_nationkey").cast("long").alias("nation"),
        band.alias("bal_band"),
        "c_mktsegment",
    ).distinct()
    return (
        qi_sens.groupBy("nation", "bal_band")
        .agg(F.count("*").alias("distinct_segments"))
        .filter(F.col("distinct_segments") < L_DIVERSITY)
    )


_LDIV_SQL = f"""
    SELECT CAST(c_nationkey AS BIGINT) AS nation,
           CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT)
                      / {L_DIV_BAND}.0) AS BIGINT) AS bal_band,
           count(DISTINCT c_mktsegment) AS distinct_segments
    FROM customer
    GROUP BY 1, 2
    HAVING count(DISTINCT c_mktsegment) < {L_DIVERSITY}
"""


QUERIES = {
    "ivm_join": q_ivm_join,
    "l_diversity": q_l_diversity,
}

ORACLES = {
    "ivm_join": _IVM_SQL,
    "l_diversity": _LDIV_SQL,
}
