"""Data-layout keys, batch 88: Hilbert-curve and Z-order (Morton)
clustering keys as pure codegen bit-twiddle folds — the key functions
behind multi-dimensional file clustering (Iceberg's ``hilbert``/
``zorder`` rewrite strategies; the catalog's ``write_zordered`` uses
the Morton form of this).

Scale design (100 TB):
- Both keys are MAP-SIDE expression folds over the 10 bit levels of
  the 1024×1024 grid — zero joins, zero shuffles, exact int64; a
  layout rewrite at any scale is then just repartitionByRange(key) +
  sortWithinPartitions(key) (see catalog.compact/write_zordered).
- ``hilbert_key``: the standard xy→d walk (per level: quadrant
  selection + reflection/rotation of the residual coordinates),
  folded over levels MSB→LSB with an (x, y, d) integer state — Spark
  ``F.aggregate`` == DuckDB ``list_reduce``, bit-identical by
  construction. Hilbert keys preserve locality strictly better than
  Morton (no quadrant-boundary jumps), which is why Iceberg added the
  strategy; the test quantifies it on this grid (mean key-gap of
  spatial neighbors, hilbert < morton).
- ``zorder_key``: bit interleave x₉y₉x₈y₈…x₀y₀ — one transform +
  sorted integer sum per bit level (order-free: integer adds).

Points are the deterministic key-derived coordinates shared with the
GIS family (geoops.py / geoops2.py). Reference parity: no layout layer
in the reference; this is cluster-scale scan infrastructure
(min/max file pruning on multi-column predicates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

BITS = 10  # 1024×1024 grid (coords live in 0..999)


def _pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_custkey") * 37 % 1000).alias("x"),
        (F.col("c_custkey") * 91 % 1000).alias("y"),
    )


_PTS_SQL = """
    SELECT c_custkey, c_custkey * 37 % 1000 AS x,
           c_custkey * 91 % 1000 AS y
    FROM customer
"""


def _zorder_col(x: Column, y: Column) -> Column:
    parts = []
    for b in range(BITS):
        parts.append(
            F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b + 1)
            + F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out.cast("long")


def _zorder_sql(x: str, y: str) -> str:
    terms = " + ".join(
        f"((({x} >> {b}) & 1) << {2 * b + 1})"
        f" + ((({y} >> {b}) & 1) << {2 * b})"
        for b in range(BITS)
    )
    return f"CAST({terms} AS BIGINT)"


def _hilbert_col(x: Column, y: Column) -> Column:
    """xy→d fold, levels MSB→LSB; state = [x, y, d] (module docstring)."""
    levels = F.array(
        *[F.lit(1 << l).cast("long") for l in range(BITS - 1, -1, -1)]
    )
    init = F.array(x.cast("long"), y.cast("long"), F.lit(0).cast("long"))

    def step(acc, s):
        cx = F.element_at(acc, 1)
        cy = F.element_at(acc, 2)
        d = F.element_at(acc, 3)
        rx = F.when(cx.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        ry = F.when(cy.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        d2 = d + s * s * ((3 * rx).bitwiseXOR(ry))
        # residuals (strip the level bit — invariant: coords < 2s), then
        # rotate/reflect the quadrant
        xr = cx.bitwiseAND(s - 1)
        yr = cy.bitwiseAND(s - 1)
        nx = F.when(ry == 1, xr).otherwise(
            F.when(rx == 1, s - 1 - yr).otherwise(yr)
        )
        ny = F.when(ry == 1, yr).otherwise(
            F.when(rx == 1, s - 1 - xr).otherwise(xr)
        )
        return F.array(nx.cast("long"), ny.cast("long"), d2.cast("long"))

    return F.element_at(F.aggregate(levels, init, step), 3)


def _hilbert_sql(x: str, y: str) -> str:
    return f"""
    (list_reduce(
        list_prepend(CAST([{x}, {y}, 0] AS BIGINT[]),
                     list_transform(generate_series({BITS - 1}, 0, -1),
                                    l -> CAST([l, 0, 0] AS BIGINT[]))),
        (acc, lv) -> [
            CASE WHEN (acc[2] & (1::BIGINT << lv[1])) > 0
                     THEN acc[1] & ((1::BIGINT << lv[1]) - 1)
                 WHEN (acc[1] & (1::BIGINT << lv[1])) > 0
                     THEN (1::BIGINT << lv[1]) - 1
                          - (acc[2] & ((1::BIGINT << lv[1]) - 1))
                 ELSE acc[2] & ((1::BIGINT << lv[1]) - 1) END,
            CASE WHEN (acc[2] & (1::BIGINT << lv[1])) > 0
                     THEN acc[2] & ((1::BIGINT << lv[1]) - 1)
                 WHEN (acc[1] & (1::BIGINT << lv[1])) > 0
                     THEN (1::BIGINT << lv[1]) - 1
                          - (acc[1] & ((1::BIGINT << lv[1]) - 1))
                 ELSE acc[1] & ((1::BIGINT << lv[1]) - 1) END,
            acc[3] + (1::BIGINT << lv[1]) * (1::BIGINT << lv[1])
                * xor(3 * (CASE WHEN (acc[1] & (1::BIGINT << lv[1])) > 0
                                THEN 1 ELSE 0 END),
                      (CASE WHEN (acc[2] & (1::BIGINT << lv[1])) > 0
                            THEN 1 ELSE 0 END))
        ])
    )[3]
    """


def q_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer point: exact Hilbert-curve distance on the 1024²
    grid (+ coords) — the layout-rewrite clustering key."""
    p = _pts(spark, sf_dir)
    return p.select(
        "c_custkey", "x", "y",
        _hilbert_col(F.col("x"), F.col("y")).alias("hkey"),
    )


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer point: Morton bit-interleave key on the same grid."""
    p = _pts(spark, sf_dir)
    return p.select(
        "c_custkey", "x", "y",
        _zorder_col(F.col("x"), F.col("y")).alias("zkey"),
    )


_HILBERT_SQL = f"""
WITH pts AS ({_PTS_SQL})
SELECT c_custkey, x::BIGINT AS x, y::BIGINT AS y,
       {_hilbert_sql('x', 'y')} AS hkey
FROM pts
"""

_ZORDER_SQL = f"""
WITH pts AS ({_PTS_SQL})
SELECT c_custkey, x::BIGINT AS x, y::BIGINT AS y,
       {_zorder_sql('x', 'y')} AS zkey
FROM pts
"""


QUERIES = {
    "hilbert_key": q_hilbert_key,
    "zorder_key": q_zorder_key,
}

ORACLES = {
    "hilbert_key": _HILBERT_SQL,
    "zorder_key": _ZORDER_SQL,
}
