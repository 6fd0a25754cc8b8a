"""Spatial surface, batch 83: point-in-polygon containment join and
exact shoelace polygon area/orientation — the polygon half of the GIS
layer (``geoops.py`` covers point-point radius joins).

Scale design (100 TB):
- ``pip_join``: the classic containment join done with ZERO exchanges:
  (1) polygons are preprocessed (at plan time here; a tiny Spark job in
  production) into a (cell_x, cell_y, poly_id) COVER TABLE of the
  coarse grid cells their bounding boxes touch — broadcast equi-join
  against each point's cell kills every (point, polygon) pair whose
  boxes don't even overlap, the standard PBSM/S2-cover prefilter; (2)
  surviving candidates broadcast-equi-join the polygon EDGE-ARRAY table
  on poly_id; (3) the exact ray-casting parity test runs as a codegen'd
  ``F.aggregate`` fold over the edge array — crossing decided by the
  INTEGER cross-product sign test (module ``_crossing`` comment), no
  division, no floats, so both engines agree bit-for-bit. The whole
  plan is scan → two broadcast hash joins → fold → filter: shuffle-free
  (plan-asserted), embarrassingly parallel at any point count. Polygon
  sets big enough to break the broadcast would shard the cover table by
  cell instead — same join keys, hash-partitioned.
- ``poly_area``: exact polygon area (×2) + winding orientation via the
  shoelace sum Σ(xᵢ·yᵢ₊₁ − xᵢ₊₁·yᵢ): ONE per-polygon window (lead +
  first for the wraparound edge) and one keyed aggregate — all int64,
  partitioned by poly_id, so 10^9 polygons scale linearly with no
  global stage.

Points are the same deterministic key-derived integer coordinates as
``geoops.py`` (x = 37k mod 1000, y = 91k mod 1000); the polygon set is
a fixed literal (one convex box, one triangle, one NON-convex L-shape
exercising multi-crossing parity, one diamond with diagonal edges).

Reference parity: generalizes the reference's rectangular box
containment (``image_scraper.py`` date-box logic → ``imaging/ops.py``)
to arbitrary simple polygons at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import table

CELL = 100  # coarse cover-grid edge (plane is 1000×1000)

# poly_id -> closed vertex ring (simple polygons, integer coords)
POLYGONS: dict[int, list[tuple[int, int]]] = {
    1: [(100, 100), (300, 100), (300, 300), (100, 300)],  # square
    2: [(500, 50), (800, 200), (550, 350)],  # triangle
    3: [  # non-convex L
        (600, 600), (900, 600), (900, 900),
        (750, 900), (750, 750), (600, 750),
    ],
    4: [(50, 700), (200, 550), (350, 700), (200, 850)],  # diamond
}


def _edges(pid: int) -> list[tuple[int, int, int, int]]:
    ring = POLYGONS[pid]
    return [
        (x1, y1, x2, y2)
        for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1])
    ]


def _cover_cells() -> list[tuple[int, int, int]]:
    """Grid cells each polygon's bbox touches (the broadcast prefilter)."""
    out = []
    for pid, ring in POLYGONS.items():
        xs = [x for x, _ in ring]
        ys = [y for _, y in ring]
        for cx in range(min(xs) // CELL, max(xs) // CELL + 1):
            for cy in range(min(ys) // CELL, max(ys) // CELL + 1):
                out.append((cx, cy, pid))
    return out


# Integer-exact ray-cast crossing for point (px,py) vs edge
# (x1,y1)-(x2,y2): the edge spans py vertically under the half-open
# rule (y1>py) != (y2>py), and the horizontal ray to +∞ crosses iff
# px is strictly left of the edge at height py. Clearing the division:
#   px < x1 + (x2-x1)(py-y1)/(y2-y1)
# ⇔ sign-adjusted cross product
#   ((x2-x1)(py-y1) - (px-x1)(y2-y1) > 0) == (y2 > y1).
def _crossing_spark(px, py, ed):
    spans = (ed.y1 > py) != (ed.y2 > py)
    t = (ed.x2 - ed.x1) * (py - ed.y1) - (px - ed.x1) * (ed.y2 - ed.y1)
    return spans & ((t > 0) == (ed.y2 > ed.y1))


def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose derived point lies inside a polygon (odd
    ray-crossing parity). Shuffle-free: cell-cover broadcast join +
    edge-array broadcast join + codegen fold (module docstring)."""
    pts = table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_custkey") * 37 % 1000).alias("px"),
        (F.col("c_custkey") * 91 % 1000).alias("py"),
    ).withColumn("cell_x", F.floor(F.col("px") / CELL).cast("long")) \
     .withColumn("cell_y", F.floor(F.col("py") / CELL).cast("long"))
    cover = spark.createDataFrame(
        _cover_cells(), "cell_x long, cell_y long, poly_id long"
    )
    polys = spark.createDataFrame(
        [(pid, _edges(pid)) for pid in sorted(POLYGONS)],
        "poly_id long, edges array<struct<x1:long,y1:long,x2:long,y2:long>>",
    )
    cand = pts.join(F.broadcast(cover), ["cell_x", "cell_y"])
    px, py = F.col("px"), F.col("py")
    crossings = F.aggregate(
        F.col("edges"),
        F.lit(0),
        lambda acc, ed: acc
        + F.when(_crossing_spark(px, py, ed), 1).otherwise(0),
    )
    return (
        cand.join(F.broadcast(polys), "poly_id")
        .withColumn("crossings", crossings)
        .filter(F.col("crossings") % 2 == 1)
        .select("c_custkey", "poly_id", "px", "py")
    )


def _pip_sql() -> str:
    cells = ", ".join(f"({cx}, {cy}, {pid})" for cx, cy, pid in _cover_cells())
    edges = ", ".join(
        f"({pid}, {x1}, {y1}, {x2}, {y2})"
        for pid in sorted(POLYGONS)
        for (x1, y1, x2, y2) in _edges(pid)
    )
    return f"""
WITH pts AS (
    SELECT c_custkey, c_custkey * 37 % 1000 AS px,
           c_custkey * 91 % 1000 AS py
    FROM customer
),
cover(cell_x, cell_y, poly_id) AS (VALUES {cells}),
edges(poly_id, x1, y1, x2, y2) AS (VALUES {edges}),
cand AS (
    SELECT p.c_custkey, p.px, p.py, c.poly_id
    FROM pts p JOIN cover c
      ON c.cell_x = px // {CELL} AND c.cell_y = py // {CELL}
),
par AS (
    SELECT cand.c_custkey, cand.poly_id, cand.px, cand.py,
           sum(CASE WHEN ((y1 > py) <> (y2 > py))
                     AND (((x2 - x1) * (py - y1)
                           - (px - x1) * (y2 - y1) > 0) = (y2 > y1))
               THEN 1 ELSE 0 END) AS crossings
    FROM cand JOIN edges USING (poly_id)
    GROUP BY 1, 2, 3, 4
)
SELECT c_custkey, poly_id, px::BIGINT AS px, py::BIGINT AS py
FROM par WHERE crossings % 2 = 1
"""


def q_poly_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shoelace 2·area and winding orientation per polygon from
    the vertex table: one per-polygon window + one keyed aggregate."""
    verts = spark.createDataFrame(
        [
            (pid, i, x, y)
            for pid, ring in sorted(POLYGONS.items())
            for i, (x, y) in enumerate(ring)
        ],
        "poly_id long, idx long, x long, y long",
    )
    w = Window.partitionBy("poly_id").orderBy("idx")
    wall = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    nx = F.coalesce(F.lead("x").over(w), F.first("x").over(wall))
    ny = F.coalesce(F.lead("y").over(w), F.first("y").over(wall))
    terms = verts.select(
        "poly_id",
        (F.col("x") * ny - nx * F.col("y")).alias("term"),
    )
    s = terms.groupBy("poly_id").agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum("term").alias("signed2"),
    )
    return s.select(
        "poly_id", "n_vertices",
        F.abs(F.col("signed2")).alias("area2"),
        (F.col("signed2") > 0).alias("is_ccw"),
    )


def _area_sql() -> str:
    verts = ", ".join(
        f"({pid}, {i}, {x}, {y})"
        for pid, ring in sorted(POLYGONS.items())
        for i, (x, y) in enumerate(ring)
    )
    return f"""
WITH verts(poly_id, idx, x, y) AS (VALUES {verts}),
e AS (
    SELECT poly_id, x, y,
           coalesce(lead(x) OVER w,
                    first_value(x) OVER (PARTITION BY poly_id
                        ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING)) AS nx,
           coalesce(lead(y) OVER w,
                    first_value(y) OVER (PARTITION BY poly_id
                        ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING)) AS ny
    FROM verts
    WINDOW w AS (PARTITION BY poly_id ORDER BY idx)
)
SELECT poly_id, count(*)::BIGINT AS n_vertices,
       abs(sum(x * ny - nx * y))::BIGINT AS area2,
       sum(x * ny - nx * y) > 0 AS is_ccw
FROM e GROUP BY poly_id
"""


QUERIES = {
    "pip_join": q_pip_join,
    "poly_area": q_poly_area,
}

ORACLES = {
    "pip_join": _pip_sql(),
    "poly_area": _area_sql(),
}
