"""Transportation problem, batch 156: the northwest-corner and
least-cost initial-allocation heuristics for a balanced 5×5
transportation problem (regions supply, segments demand) — the
operations-research classics next to lpt_makespan/knapsack_select,
with the cost-matrix greedy beating the order-blind corner rule as the
comparison readout.

Scale design (100 TB):
- Supplies (customers per region) and demands (customers per segment)
  are ONE keyed aggregate each over the same join — balanced by
  construction (both margins sum to n). The cost matrix is a
  data-independent md5 literal (shared verbatim with the oracle).
- Both allocations are bounded in-row folds over the 25 cells on a
  ONE-ROW pivot: state = [supplies(5), demands(5), cost, alloc(25)]
  packed in a 36-long array (the DGIM packed-state discipline).
  ``transport_nw`` visits cells in row-major order allocating
  min(s_i, d_j); ``transport_lcm`` runs 25 steps, each an inner
  bounded scan choosing the cheapest open cell (packed-key argmin,
  deterministic tie-break by cell index). Everything exact int64;
  feasibility (all margins exhausted) is part of the output and
  pinned, as is LCM ≤ NW on total cost for this instance.

Reference parity: no OR layer in the reference; extends lpt_makespan,
johnson_flowshop, knapsack_select, stable_matching, neyman_alloc.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .rakingops import REGIONS, SEGMENTS
from .util import table

D = 5
NCELL = D * D
# data-independent literal cost matrix (md5 of the cell tag)
COSTS = [
    [
        int(hashlib.md5(f"tc|{i}|{j}".encode()).hexdigest()[:8], 16) % 90
        + 10
        for j in range(D)
    ]
    for i in range(D)
]


def _margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    j = (
        c.join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .select(
            F.col("r_name").alias("reg"), F.col("c_mktsegment").alias("seg")
        )
    )
    aggs = []
    for i, g in enumerate(REGIONS):
        aggs.append(
            F.sum((F.col("reg") == g).cast("long")).cast("long").alias(f"s_{i}")
        )
    for jj, s in enumerate(SEGMENTS):
        aggs.append(
            F.sum((F.col("seg") == s).cast("long")).cast("long").alias(f"d_{jj}")
        )
    return j.agg(*aggs)


def _init_state() -> Column:
    # [s0..s4, d0..d4, cost, alloc x25] — supplies/demands filled below
    return F.concat(
        F.array(*[F.col(f"s_{i}") for i in range(D)]),
        F.array(*[F.col(f"d_{j}") for j in range(D)]),
        F.array(*[F.lit(0).cast("long") for _ in range(1 + NCELL)]),
    )


def _costs_arr() -> Column:
    return F.array(
        *[F.lit(COSTS[k // D][k % D]).cast("long") for k in range(NCELL)]
    )


def _nw_fold(state: Column) -> Column:
    """Row-major corner fold as ONE F.aggregate (acc is a lambda var —
    no expression-tree blowup)."""
    costs = _costs_arr()

    def step(acc, kk):
        k0 = kk - 1
        ii = F.floor(k0 / D).cast("int")
        jj = (k0 % D).cast("int")
        a = F.least(
            F.element_at(acc, ii + 1), F.element_at(acc, D + jj + 1)
        )
        return F.transform(
            F.sequence(F.lit(1), F.lit(11 + NCELL)),
            lambda t: F.when(t == ii + 1, F.element_at(acc, ii + 1) - a)
            .when(
                t == D + jj + 1, F.element_at(acc, D + jj + 1) - a
            )
            .when(
                t == 2 * D + 1,
                F.element_at(acc, 2 * D + 1) + a * F.element_at(costs, kk),
            )
            .when(t == 11 + kk, a)
            .otherwise(F.element_at(acc, t)),
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(NCELL)), state, step
    )


def q_transport_nw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Northwest-corner allocation (module doc): one row per cell
    (reg, seg, cost_cell, alloc) plus total cost and feasibility."""
    m = _margins(spark, sf_dir)
    fin = _nw_fold(_init_state())
    m = m.withColumn("fin", fin)
    left = sum(
        F.element_at(F.col("fin"), t + 1) for t in range(2 * D)
    )
    stacked = ", ".join(
        f"'{REGIONS[k // D]}', '{SEGMENTS[k % D]}', "
        f"CAST({COSTS[k // D][k % D]} AS BIGINT), "
        f"element_at(fin, {2 * D + 2 + k})"
        for k in range(NCELL)
    )
    return m.select(
        F.expr(
            f"stack({NCELL}, {stacked}) AS (reg, seg, cost_cell, alloc)"
        ),
        F.element_at(F.col("fin"), 2 * D + 1).alias("total_cost"),
        (left == 0).cast("long").alias("feasible"),
    ).orderBy("reg", "seg")


def _lcm_fold(state: Column) -> Column:
    """25 least-cost steps as ONE F.aggregate; each step's argmin is a
    bounded unrolled least() over the 25 cells (acc is a lambda var)."""
    costs = _costs_arr()
    big = 1 << 40

    def step(acc, _):
        key = None
        for k in range(NCELL):
            i, j = k // D, k % D
            open_ = (F.element_at(acc, i + 1) > 0) & (
                F.element_at(acc, D + j + 1) > 0
            )
            cand = F.when(
                open_, F.lit(COSTS[i][j] * 64 + k).cast("long")
            ).otherwise(F.lit(big).cast("long"))
            key = cand if key is None else F.least(key, cand)
        kk = (key % 64).cast("int")
        ii = F.floor(kk / D).cast("int")
        jj = (kk % D).cast("int")
        a = F.when(key >= big, F.lit(0).cast("long")).otherwise(
            F.least(
                F.element_at(acc, ii + 1), F.element_at(acc, D + jj + 1)
            )
        )
        return F.transform(
            F.sequence(F.lit(1), F.lit(11 + NCELL)),
            lambda t: F.when(t == ii + 1, F.element_at(acc, ii + 1) - a)
            .when(
                t == D + jj + 1, F.element_at(acc, D + jj + 1) - a
            )
            .when(
                t == 2 * D + 1,
                F.element_at(acc, 2 * D + 1)
                + a * F.element_at(costs, kk + 1),
            )
            .when(t == 12 + kk, F.element_at(acc, 12 + kk) + a)
            .otherwise(F.element_at(acc, t)),
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(NCELL)), state, step
    )


def q_transport_lcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-cost-method allocation (module doc): same shape as
    transport_nw plus the NW total for comparison."""
    m = _margins(spark, sf_dir)
    m = m.withColumn("fin", _lcm_fold(_init_state())).withColumn(
        "nwfin", _nw_fold(_init_state())
    )
    left = sum(
        F.element_at(F.col("fin"), t + 1) for t in range(2 * D)
    )
    stacked = ", ".join(
        f"'{REGIONS[k // D]}', '{SEGMENTS[k % D]}', "
        f"CAST({COSTS[k // D][k % D]} AS BIGINT), "
        f"element_at(fin, {2 * D + 2 + k})"
        for k in range(NCELL)
    )
    return m.select(
        F.expr(
            f"stack({NCELL}, {stacked}) AS (reg, seg, cost_cell, alloc)"
        ),
        F.element_at(F.col("fin"), 2 * D + 1).alias("total_cost"),
        F.element_at(F.col("nwfin"), 2 * D + 1).alias("nw_cost"),
        (left == 0).cast("long").alias("feasible"),
    ).orderBy("reg", "seg")


def _margins_sql() -> str:
    aggs = []
    for i, g in enumerate(REGIONS):
        aggs.append(
            f"sum(CASE WHEN reg = '{g}' THEN 1 ELSE 0 END)::BIGINT AS s_{i}"
        )
    for jj, s in enumerate(SEGMENTS):
        aggs.append(
            f"sum(CASE WHEN seg = '{s}' THEN 1 ELSE 0 END)::BIGINT AS d_{jj}"
        )
    return f"""
cells AS (
    SELECT r_name AS reg, c_mktsegment AS seg
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey),
m AS (SELECT {', '.join(aggs)} FROM cells)"""


def _nw_layers() -> list[str]:
    """Layered CTE expressions mirroring _nw_fold: one layer per cell,
    state columns a{L}_{t} (1-indexed t over the 36 slots)."""
    layers = []
    # a0: initial state
    init_cols = (
        [f"s_{i} AS a0_{i + 1}" for i in range(D)]
        + [f"d_{j} AS a0_{D + j + 1}" for j in range(D)]
        + [f"0::BIGINT AS a0_{2 * D + 1}"]
        + [f"0::BIGINT AS a0_{2 * D + 2 + k}" for k in range(NCELL)]
    )
    layers.append("n0 AS (SELECT *, " + ", ".join(init_cols) + " FROM m)")
    for k in range(NCELL):
        i, j = k // D, k % D
        p, q = k, k + 1
        a = f"least(a{p}_{i + 1}, a{p}_{D + j + 1})"
        cols = []
        for t in range(1, 12 + NCELL):
            if t == i + 1:
                cols.append(f"a{p}_{t} - {a} AS a{q}_{t}")
            elif t == D + j + 1:
                cols.append(f"a{p}_{t} - {a} AS a{q}_{t}")
            elif t == 2 * D + 1:
                cols.append(
                    f"a{p}_{t} + {a} * {COSTS[i][j]} AS a{q}_{t}"
                )
            elif t == 2 * D + 2 + k:
                cols.append(f"{a} AS a{q}_{t}")
            else:
                cols.append(f"a{p}_{t} AS a{q}_{t}")
        layers.append(f"n{q} AS MATERIALIZED (SELECT *, " + ", ".join(cols) + f" FROM n{p})")
    return layers


def _nw_sql() -> str:
    layers = _nw_layers()
    last = f"n{NCELL}"
    left = " + ".join(f"a{NCELL}_{t + 1}" for t in range(2 * D))
    sel = " UNION ALL ".join(
        f"SELECT '{REGIONS[k // D]}' AS reg, '{SEGMENTS[k % D]}' AS seg, "
        f"{COSTS[k // D][k % D]}::BIGINT AS cost_cell, "
        f"a{NCELL}_{2 * D + 2 + k} AS alloc, "
        f"a{NCELL}_{2 * D + 1} AS total_cost, "
        f"(({left}) = 0)::BIGINT AS feasible FROM {last}"
        for k in range(NCELL)
    )
    return (
        "WITH " + _margins_sql() + ",\n" + ",\n".join(layers) + "\n"
        + sel + "\nORDER BY reg, seg"
    )


def _lcm_layers(prefix: str) -> list[str]:
    layers = []
    init_cols = (
        [f"s_{i} AS {prefix}0_{i + 1}" for i in range(D)]
        + [f"d_{j} AS {prefix}0_{D + j + 1}" for j in range(D)]
        + [f"0::BIGINT AS {prefix}0_{2 * D + 1}"]
        + [f"0::BIGINT AS {prefix}0_{2 * D + 2 + k}" for k in range(NCELL)]
    )
    layers.append(
        f"{prefix}i0 AS (SELECT *, " + ", ".join(init_cols) + " FROM m)"
    )
    big = 1 << 40
    for step in range(NCELL):
        p, q = step, step + 1
        cands = ", ".join(
            f"(CASE WHEN {prefix}{p}_{k // D + 1} > 0 AND "
            f"{prefix}{p}_{D + k % D + 1} > 0 THEN "
            f"{COSTS[k // D][k % D] * 64 + k}::BIGINT "
            f"ELSE {big}::BIGINT END)"
            for k in range(NCELL)
        )
        layers.append(
            f"{prefix}k{q} AS MATERIALIZED (SELECT *, least({cands}) AS key{q} "
            f"FROM {prefix}i{p})"
        )
        amt_cases = " ".join(
            f"WHEN key{q} % 64 = {k} THEN "
            f"least({prefix}{p}_{k // D + 1}, {prefix}{p}_{D + k % D + 1})"
            for k in range(NCELL)
        )
        layers.append(
            f"{prefix}a{q} AS MATERIALIZED (SELECT *, "
            f"(CASE WHEN key{q} >= {big} THEN 0 {amt_cases} ELSE 0 END)"
            f"::BIGINT AS amt{q} FROM {prefix}k{q})"
        )
        cols = []
        for t in range(1, 12 + NCELL):
            terms = []
            for k in range(NCELL):
                i, j = k // D, k % D
                if t == i + 1 or t == D + j + 1:
                    terms.append(
                        f"WHEN key{q} % 64 = {k} AND key{q} < {big} "
                        f"THEN {prefix}{p}_{t} - amt{q}"
                    )
                elif t == 2 * D + 1:
                    terms.append(
                        f"WHEN key{q} % 64 = {k} AND key{q} < {big} "
                        f"THEN {prefix}{p}_{t} + amt{q} * {COSTS[i][j]}"
                    )
                elif t == 2 * D + 2 + k:
                    terms.append(
                        f"WHEN key{q} % 64 = {k} AND key{q} < {big} "
                        f"THEN {prefix}{p}_{t} + amt{q}"
                    )
            if terms:
                cols.append(
                    f"(CASE {' '.join(terms)} ELSE {prefix}{p}_{t} END) "
                    f"AS {prefix}{q}_{t}"
                )
            else:
                cols.append(f"{prefix}{p}_{t} AS {prefix}{q}_{t}")
        layers.append(
            f"{prefix}i{q} AS MATERIALIZED (SELECT *, " + ", ".join(cols)
            + f" FROM {prefix}a{q})"
        )
    return layers


def _lcm_sql() -> str:
    layers = _lcm_layers("L") + _nw_layers()
    last = f"L{NCELL}"
    left = " + ".join(f"L{NCELL}_{t + 1}" for t in range(2 * D))
    sel = " UNION ALL ".join(
        f"SELECT '{REGIONS[k // D]}' AS reg, '{SEGMENTS[k % D]}' AS seg, "
        f"{COSTS[k // D][k % D]}::BIGINT AS cost_cell, "
        f"{last}_{2 * D + 2 + k} AS alloc, "
        f"{last}_{2 * D + 1} AS total_cost, "
        f"a{NCELL}_{2 * D + 1} AS nw_cost, "
        f"(({left}) = 0)::BIGINT AS feasible FROM fin"
        for k in range(NCELL)
    )
    return (
        "WITH " + _margins_sql() + ",\n" + ",\n".join(layers)
        + f",\nfin AS (SELECT "
        + ", ".join([f"L.L{NCELL}_{t}" for t in range(1, 12 + NCELL)])
        + f", n.a{NCELL}_{2 * D + 1} FROM Li{NCELL} L, n{NCELL} n)\n"
        + sel + "\nORDER BY reg, seg"
    )


QUERIES = {
    "transport_nw": q_transport_nw,
    "transport_lcm": q_transport_lcm,
}

ORACLES = {
    "transport_nw": _nw_sql(),
    "transport_lcm": _lcm_sql(),
}
