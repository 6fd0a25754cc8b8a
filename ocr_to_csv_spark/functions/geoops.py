"""Spatial surface, batch 49: grid-bucketed radius join — the
spatial-join-without-a-spatial-index pattern (the geohash/S2/H3 cell
trick every distributed engine uses for points-within-distance).

Scale design (100 TB): a radius join is a cross join semantically; the
grid makes it an EQUI-join. Each point lands in one ceil-16 cell; the
probe side expands to its 3×3 neighbor cells (a constant 9× map-side
explode — cell edge ≥ radius guarantees no candidate escapes), the
join runs hash-partitioned on the cell id, and the exact distance
predicate filters candidates after the join. Shuffle volume is
O(points·9), never O(points²); skewed cells (urban density) split
under AQE like any hot hash key. The DuckDB oracle is the SEMANTICS —
a brute-force distance cross-join — while the Spark side is the scale
plan; the gate proves them identical, and the plan audit proves the
Spark side contains no cartesian product.

Coordinates are synthesized deterministically from the keys
(x = 37·k mod 1000, y = 91·k mod 1000 — integer arithmetic both
engines reproduce exactly); swap in real lon/lat columns and a
degree-scaled cell size for production data.

Reference parity: no spatial layer in the reference (rad10/OCR-to-CSV)
— this generalizes the box-containment join of ``imaging/ops.py`` to
point sets that never fit one machine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

GRID = 16   # cell edge — must be ≥ RADIUS so 3×3 neighbors cover
RADIUS2 = 64  # radius 8, squared


def q_geo_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (supplier, customer) point pairs within distance 8: grid
    equi-join + exact integer distance filter."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_custkey") * 37 % 1000).alias("cx"),
        (F.col("c_custkey") * 91 % 1000).alias("cy"),
    ).withColumn("cell_x", F.floor(F.col("cx") / GRID)) \
     .withColumn("cell_y", F.floor(F.col("cy") / GRID))
    offs = F.expr("sequence(-1, 1)")
    supp = (
        table(spark, sf_dir, "supplier").select(
            "s_suppkey",
            (F.col("s_suppkey") * 53 % 1000).alias("sx"),
            (F.col("s_suppkey") * 17 % 1000).alias("sy"),
        )
        .withColumn("dx", F.explode(offs))
        .withColumn("dy", F.explode(offs))
        .withColumn("cell_x", F.floor(F.col("sx") / GRID) + F.col("dx"))
        .withColumn("cell_y", F.floor(F.col("sy") / GRID) + F.col("dy"))
        .drop("dx", "dy")
    )
    j = supp.join(cust, ["cell_x", "cell_y"])
    d2 = (
        (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx"))
        + (F.col("cy") - F.col("sy")) * (F.col("cy") - F.col("sy"))
    )
    return (
        j.withColumn("dist2", d2)
        .filter(F.col("dist2") <= RADIUS2)
        .select("s_suppkey", "c_custkey", "dist2")
    )


_GEO_SQL = f"""
WITH c AS (
    SELECT c_custkey, c_custkey * 37 % 1000 AS cx,
           c_custkey * 91 % 1000 AS cy
    FROM customer
),
s AS (
    SELECT s_suppkey, s_suppkey * 53 % 1000 AS sx,
           s_suppkey * 17 % 1000 AS sy
    FROM supplier
)
SELECT s_suppkey, c_custkey,
       ((cx - sx) * (cx - sx) + (cy - sy) * (cy - sy))::BIGINT AS dist2
FROM s, c
WHERE (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= {RADIUS2}
"""


QUERIES = {"geo_grid_join": q_geo_grid_join}
ORACLES = {"geo_grid_join": _GEO_SQL}
