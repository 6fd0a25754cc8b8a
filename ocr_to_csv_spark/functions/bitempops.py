"""Bitemporal + robust-fit operators, batch 112: transaction-time ×
valid-time AS-OF reads over a versioned record table, and exact
quantile regression by grid search — the audit-trail query SCD2 alone
cannot answer ("what did we BELIEVE on date T1 about the state at date
T2") and the τ-quantile fit OLS/Theil–Sen/RANSAC don't cover.

Scale design (100 TB):
- ``bitemporal_asof``: record versions are synthesized
  deterministically per customer (version v ∈ 0..2: recorded_at =
  1995-01-01 + 30v days, valid_from = 1995-01-01 + 15v days, balance =
  acctbal + 100v — map-side, no extra table); each probe (T_tx,
  T_valid) from the 4-row literal panel selects, per key, the version
  with recorded_at ≤ T_tx AND valid_from ≤ T_valid maximizing
  (valid_from, recorded_at) — ONE keyed max-struct argmax after a
  broadcast probe-panel join, the asof_join discipline widened to two
  time axes. Emits per probe the visible-population rollup (count +
  exact cents sum + latest valid_from), so the output is
  probe-panel-sized however big the table is.
- ``quantile_fit``: τ = 0.9 quantile regression of order totalprice
  cents against a derived integer feature, fit by EXACT grid search —
  the (slope, intercept) candidate panel is a fixed literal, pinball
  loss Σ max(τ·r, (τ−1)·r) is computed with τ = 9/10 in ×10-scaled
  int64 (no floats anywhere), one broadcast panel cross (bounded,
  allowlisted tier) + one keyed aggregate + one argmin max-struct.
  The defining check (test-pinned): the winning line leaves ~90% of
  the points at-or-below it (900–902‰ measured at both SFs).

Reference parity: no temporal/versioned layer in the reference;
completes the SCD family (scd2, asof_join, ivm_join, read_changes)
with the second time axis, and the fit family (ols_fit, theil_sen,
ransac_fit, isotonic_fit) with the quantile-loss member.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

BASE = "1995-01-01"
N_VERSIONS = 3
# (probe_id, tx_time, valid_time)
PROBES: list[tuple[int, str, str]] = [
    (1, "1995-01-20", "1995-01-20"),  # only v0 recorded & valid
    (2, "1995-02-15", "1995-03-01"),  # v1 recorded; v1 valid
    (3, "1995-02-15", "1995-01-10"),  # v1 recorded but asking about past
    (4, "1995-12-31", "1995-12-31"),  # everything visible → v2
]

TAU_NUM, TAU_DEN = 9, 10  # τ = 0.9
# grid calibrated to the data scale: totalprice cents sit in ~5·10^6 …
# 5·10^7 (q90 ≈ 4.5·10^7) and x = custkey % 1000 is near-uncorrelated,
# so slopes bracket zero and intercepts bracket the 0.9 quantile
SLOPES = [-2_000, -1_000, 0, 1_000, 2_000]
INTERCEPTS = [
    35_000_000, 40_000_000, 42_500_000, 45_000_000, 47_500_000, 50_000_000,
]


def _versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    v = F.explode(F.array(*[F.lit(i) for i in range(N_VERSIONS)])).alias("v")
    base = F.lit(BASE).cast("date")
    out = c.select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents0"),
        v,
    )
    return out.select(
        "c_custkey",
        "v",
        F.date_add(base, F.col("v") * 30).alias("recorded_at"),
        F.date_add(base, F.col("v") * 15).alias("valid_from"),
        (F.col("cents0") + F.col("v") * 10_000).alias("cents"),
    )


_VERSIONS_SQL = f"""
    SELECT c_custkey, v,
           DATE '{BASE}' + CAST(v * 30 AS INTEGER) AS recorded_at,
           DATE '{BASE}' + CAST(v * 15 AS INTEGER) AS valid_from,
           (CAST(round(c_acctbal * 100) AS BIGINT) + v * 10000) AS cents
    FROM customer,
         LATERAL (SELECT unnest(range({N_VERSIONS})) AS v)
"""


def q_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per probe: visible-key count, selected-version cents sum,
    latest valid_from among selections (module doc)."""
    ver = _versions(spark, sf_dir)
    probes = spark.createDataFrame(
        PROBES, "probe_id long, tx string, valid string"
    ).select(
        "probe_id",
        F.col("tx").cast("date").alias("tx"),
        F.col("valid").cast("date").alias("valid"),
    )
    j = ver.crossJoin(F.broadcast(probes)).filter(
        (F.col("recorded_at") <= F.col("tx"))
        & (F.col("valid_from") <= F.col("valid"))
    )
    sel = j.groupBy("probe_id", "c_custkey").agg(
        F.max(F.struct("valid_from", "recorded_at", "cents")).alias("m")
    )
    return (
        sel.groupBy("probe_id")
        .agg(
            F.count(F.lit(1)).alias("n_visible"),
            F.sum("m.cents").alias("sum_cents"),
            F.max("m.valid_from").alias("latest_valid_from"),
        )
        .select(
            "probe_id",
            F.col("n_visible").cast("long").alias("n_visible"),
            F.col("sum_cents").cast("long").alias("sum_cents"),
            F.col("latest_valid_from").cast("string").alias(
                "latest_valid_from"
            ),
        )
        .orderBy("probe_id")
    )


def _probes_sql() -> str:
    rows = ", ".join(
        f"({pid}, DATE '{tx}', DATE '{valid}')" for pid, tx, valid in PROBES
    )
    return f"SELECT * FROM (VALUES {rows}) AS t(probe_id, tx, valid)"


_BITEMP_SQL = f"""
WITH ver AS ({_VERSIONS_SQL}),
probes AS ({_probes_sql()}),
j AS (
    SELECT p.probe_id, v.c_custkey,
           max(struct_pack(valid_from := v.valid_from,
                           recorded_at := v.recorded_at,
                           cents := v.cents)) AS m
    FROM ver v CROSS JOIN probes p
    WHERE v.recorded_at <= p.tx AND v.valid_from <= p.valid
    GROUP BY p.probe_id, v.c_custkey
)
SELECT probe_id,
       count(*)::BIGINT AS n_visible,
       sum(m.cents)::BIGINT AS sum_cents,
       CAST(max(m.valid_from) AS VARCHAR) AS latest_valid_from
FROM j
GROUP BY probe_id
ORDER BY probe_id
"""


def q_quantile_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """τ=0.9 grid-search quantile line for totalprice cents vs the
    derived integer feature x = o_custkey % 1000 (module doc). One row:
    best (slope, intercept), scaled loss, and the under-line share."""
    o = table(spark, sf_dir, "orders")
    pts = o.select(
        (F.col("o_custkey") % 1000).cast("long").alias("x"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    grid = spark.createDataFrame(
        [(a, b) for a in SLOPES for b in INTERCEPTS],
        "slope long, intercept long",
    )
    r = F.col("y") - (F.col("slope") * F.col("x") + F.col("intercept"))
    loss10 = F.greatest(TAU_NUM * r, (TAU_NUM - TAU_DEN) * r)
    j = pts.crossJoin(F.broadcast(grid))
    agg = j.groupBy("slope", "intercept").agg(
        F.sum(loss10).alias("loss10"),
        F.sum((r <= 0).cast("long")).alias("n_under"),
        F.count(F.lit(1)).alias("n"),
    )
    best = agg.agg(
        F.min(
            F.struct(
                F.col("loss10"), F.col("slope"), F.col("intercept"),
                F.col("n_under"), F.col("n"),
            )
        ).alias("m")
    )
    return best.select(
        F.col("m.slope").cast("long").alias("slope"),
        F.col("m.intercept").cast("long").alias("intercept"),
        F.col("m.loss10").cast("long").alias("loss10"),
        F.col("m.n_under").cast("long").alias("n_under"),
        F.col("m.n").cast("long").alias("n"),
        F.floor(F.col("m.n_under") * 1000 / F.col("m.n")).cast("long").alias(
            "under_milli"
        ),
    )


def _grid_sql() -> str:
    rows = ", ".join(
        f"({a}, {b})" for a in SLOPES for b in INTERCEPTS
    )
    return f"SELECT * FROM (VALUES {rows}) AS t(slope, intercept)"


_QFIT_SQL = f"""
WITH pts AS (
    SELECT (o_custkey % 1000)::BIGINT AS x,
           CAST(round(o_totalprice * 100) AS BIGINT) AS y
    FROM orders
),
grid AS ({_grid_sql()}),
agg AS (
    SELECT slope, intercept,
           sum(greatest({TAU_NUM} * (y - (slope * x + intercept)),
                        ({TAU_NUM - TAU_DEN}) * (y - (slope * x + intercept))
               ))::BIGINT AS loss10,
           sum(CASE WHEN y - (slope * x + intercept) <= 0
                    THEN 1 ELSE 0 END)::BIGINT AS n_under,
           count(*)::BIGINT AS n
    FROM pts CROSS JOIN grid
    GROUP BY slope, intercept
),
best AS (
    SELECT min(struct_pack(loss10 := loss10, slope := slope,
                           intercept := intercept, n_under := n_under,
                           n := n)) AS m
    FROM agg
)
SELECT m.slope::BIGINT AS slope, m.intercept::BIGINT AS intercept,
       m.loss10::BIGINT AS loss10, m.n_under::BIGINT AS n_under,
       m.n::BIGINT AS n,
       CAST(floor(m.n_under * 1000.0 / m.n) AS BIGINT) AS under_milli
FROM best
"""


QUERIES = {
    "bitemporal_asof": q_bitemporal_asof,
    "quantile_fit": q_quantile_fit,
}

ORACLES = {
    "bitemporal_asof": _BITEMP_SQL,
    "quantile_fit": _QFIT_SQL,
}
