"""Computational geometry joins, batch 145: segment-intersection
counting with exact integer orientation tests, and a rectangle-overlap
join with the canonical-cell dedup trick — the two sweep-line classics
re-expressed as grid equi-joins next to geo_grid_join/closest_pair.

Scale design (100 TB):
- ``segment_intersect``: segments are short by construction (hashed
  anchor, hashed offset in [-64, 64]²), so two intersecting segments
  have midpoints within 91 < GRID=256 units — registering each
  segment once per 3×3 midpoint-cell neighborhood makes the candidate
  set ONE equi-join on the cell key, each pair produced exactly once
  (single matching offset). The intersection predicate is the exact
  integer orientation test (sign products of cross products ≤ 0 both
  ways, bounding-box guard for the collinear case) — no floats, no
  epsilon. Output: counts + the exact intersecting-pair total.
- ``rect_overlap``: rectangles (hashed corner, hashed 1..128 extent)
  span ≤ 2 cells per axis; each registers in every covered cell
  (bounded 2×2 explode), candidates equi-join on the cell, and a pair
  is COUNTED ONLY in the canonical cell containing the overlap
  region's low corner — the standard spatial-join dedup that needs no
  DISTINCT at all. Overlap areas are exact int64.

Reference parity: no geometry layer in the reference; extends
geo_grid_join (geoops.py:38), closest_pair (brierops), convex_hull,
pip_join, interval_overlap (1-D → 2-D).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import DUCK_HEX32, hex32, table

G_UNIVERSE = 4096
G_GRID = 256
SEG_OFF = 129  # offsets in [-64, 64]
RECT_EXT = 128  # extents in 1..128


def _segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    k = F.col("s_suppkey").cast("string")

    def h(tag):
        return hex32(F.concat(F.lit(tag + "|"), k))

    x1 = h("sgx") % G_UNIVERSE + SEG_OFF
    y1 = h("sgy") % G_UNIVERSE + SEG_OFF
    x2 = x1 + (h("sgu") % SEG_OFF - (SEG_OFF - 1) // 2)
    y2 = y1 + (h("sgv") % SEG_OFF - (SEG_OFF - 1) // 2)
    return s.select(
        F.col("s_suppkey").cast("long").alias("id"),
        x1.alias("x1"), y1.alias("y1"), x2.alias("x2"), y2.alias("y2"),
        F.floor((x1 + x2) / (2 * G_GRID)).alias("cx"),
        F.floor((y1 + y2) / (2 * G_GRID)).alias("cy"),
    )


def _orient(ax, ay, bx, by, cx, cy) -> Column:
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def q_segment_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (module doc): (n_segments, n_cand, n_intersect)."""
    segs = _segments(spark, sf_dir)
    a = segs.select(*[F.col(c).alias(f"a{c}") for c in segs.columns])
    offs = F.expr("sequence(-1, 1)")
    b = (
        segs.select(*[F.col(c).alias(f"b{c}") for c in segs.columns])
        .withColumn("dx", F.explode(offs))
        .withColumn("dy", F.explode(offs))
        .select(
            "bid", "bx1", "by1", "bx2", "by2",
            (F.col("bcx") + F.col("dx")).alias("jx"),
            (F.col("bcy") + F.col("dy")).alias("jy"),
        )
    )
    cand = a.join(
        b,
        (a["acx"] == b["jx"]) & (a["acy"] == b["jy"])
        & (F.col("aid") < F.col("bid")),
    )
    d1 = _orient(F.col("ax1"), F.col("ay1"), F.col("ax2"), F.col("ay2"),
                 F.col("bx1"), F.col("by1"))
    d2 = _orient(F.col("ax1"), F.col("ay1"), F.col("ax2"), F.col("ay2"),
                 F.col("bx2"), F.col("by2"))
    d3 = _orient(F.col("bx1"), F.col("by1"), F.col("bx2"), F.col("by2"),
                 F.col("ax1"), F.col("ay1"))
    d4 = _orient(F.col("bx1"), F.col("by1"), F.col("bx2"), F.col("by2"),
                 F.col("ax2"), F.col("ay2"))
    bbox = (
        (F.least("ax1", "ax2") <= F.greatest("bx1", "bx2"))
        & (F.least("bx1", "bx2") <= F.greatest("ax1", "ax2"))
        & (F.least("ay1", "ay2") <= F.greatest("by1", "by2"))
        & (F.least("by1", "by2") <= F.greatest("ay1", "ay2"))
    )
    inter = (d1 * d2 <= 0) & (d3 * d4 <= 0) & bbox
    n_seg = segs.count()
    return cand.agg(
        F.lit(n_seg).cast("long").alias("n_segments"),
        F.count(F.lit(1)).cast("long").alias("n_cand"),
        F.sum(inter.cast("long")).cast("long").alias("n_intersect"),
    )


def _rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    k = F.col("p_partkey").cast("string")

    def h(tag):
        return hex32(F.concat(F.lit(tag + "|"), k))

    x = h("rcx") % G_UNIVERSE
    y = h("rcy") % G_UNIVERSE
    w = h("rcw") % RECT_EXT + 1
    ht = h("rch") % RECT_EXT + 1
    return p.select(
        F.col("p_partkey").cast("long").alias("id"),
        x.alias("x1"), y.alias("y1"),
        (x + w).alias("x2"), (y + ht).alias("y2"),
    )


def q_rect_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (module doc): (n_rects, n_pairs, total_area)."""
    r = _rects(spark, sf_dir)
    covered = r.select(
        "id", "x1", "y1", "x2", "y2",
        F.explode(
            F.sequence(
                F.floor(F.col("x1") / G_GRID), F.floor(F.col("x2") / G_GRID)
            )
        ).alias("cx"),
    ).select(
        "id", "x1", "y1", "x2", "y2", "cx",
        F.explode(
            F.sequence(
                F.floor(F.col("y1") / G_GRID), F.floor(F.col("y2") / G_GRID)
            )
        ).alias("cy"),
    )
    a = covered.select(*[F.col(c).alias(f"a{c}") for c in covered.columns])
    b = covered.select(*[F.col(c).alias(f"b{c}") for c in covered.columns])
    j = a.join(
        b,
        (a["acx"] == b["bcx"]) & (a["acy"] == b["bcy"])
        & (F.col("aid") < F.col("bid")),
    )
    ox1 = F.greatest("ax1", "bx1")
    oy1 = F.greatest("ay1", "by1")
    ox2 = F.least("ax2", "bx2")
    oy2 = F.least("ay2", "by2")
    overlap = (ox1 <= ox2) & (oy1 <= oy2)
    canonical = (
        (F.floor(ox1 / G_GRID) == F.col("acx"))
        & (F.floor(oy1 / G_GRID) == F.col("acy"))
    )
    area = (ox2 - ox1) * (oy2 - oy1)
    kept = j.filter(overlap & canonical)
    n_rects = r.count()
    return kept.agg(
        F.lit(n_rects).cast("long").alias("n_rects"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(area).cast("long").alias("total_area"),
    )


def _h(tag: str, key: str) -> str:
    return DUCK_HEX32.format(x=f"'{tag}|' || {key}::VARCHAR")


_SEG_SQL = f"""
WITH segs AS (
    SELECT s_suppkey::BIGINT AS id,
           {_h('sgx', 's_suppkey')} % {G_UNIVERSE} + {SEG_OFF} AS x1,
           {_h('sgy', 's_suppkey')} % {G_UNIVERSE} + {SEG_OFF} AS y1,
           {_h('sgx', 's_suppkey')} % {G_UNIVERSE} + {SEG_OFF}
               + ({_h('sgu', 's_suppkey')} % {SEG_OFF} - {(SEG_OFF - 1) // 2})
               AS x2,
           {_h('sgy', 's_suppkey')} % {G_UNIVERSE} + {SEG_OFF}
               + ({_h('sgv', 's_suppkey')} % {SEG_OFF} - {(SEG_OFF - 1) // 2})
               AS y2
    FROM supplier
),
cells AS (
    SELECT *, (x1 + x2) // (2 * {G_GRID}) AS cx,
              (y1 + y2) // (2 * {G_GRID}) AS cy
    FROM segs
),
cand AS (
    SELECT a.id AS aid, a.x1 AS ax1, a.y1 AS ay1, a.x2 AS ax2, a.y2 AS ay2,
           b.id AS bid, b.x1 AS bx1, b.y1 AS by1, b.x2 AS bx2, b.y2 AS by2
    FROM cells a
    JOIN (SELECT c.*, c.cx + dx.d AS jx, c.cy + dy.d AS jy
          FROM cells c,
               (SELECT unnest(generate_series(-1, 1)) AS d) dx,
               (SELECT unnest(generate_series(-1, 1)) AS d) dy) b
      ON a.cx = b.jx AND a.cy = b.jy AND a.id < b.id
),
tested AS (
    SELECT *,
        ((ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)) AS d1,
        ((ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)) AS d2,
        ((bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)) AS d3,
        ((bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)) AS d4,
        (least(ax1, ax2) <= greatest(bx1, bx2)
         AND least(bx1, bx2) <= greatest(ax1, ax2)
         AND least(ay1, ay2) <= greatest(by1, by2)
         AND least(by1, by2) <= greatest(ay1, ay2)) AS bbox
    FROM cand
)
SELECT (SELECT count(*) FROM segs)::BIGINT AS n_segments,
       count(*)::BIGINT AS n_cand,
       sum(CASE WHEN d1 * d2 <= 0 AND d3 * d4 <= 0 AND bbox
                THEN 1 ELSE 0 END)::BIGINT AS n_intersect
FROM tested
"""

_RECT_SQL = f"""
WITH rects AS (
    SELECT p_partkey::BIGINT AS id,
           {_h('rcx', 'p_partkey')} % {G_UNIVERSE} AS x1,
           {_h('rcy', 'p_partkey')} % {G_UNIVERSE} AS y1,
           {_h('rcx', 'p_partkey')} % {G_UNIVERSE}
               + {_h('rcw', 'p_partkey')} % {RECT_EXT} + 1 AS x2,
           {_h('rcy', 'p_partkey')} % {G_UNIVERSE}
               + {_h('rch', 'p_partkey')} % {RECT_EXT} + 1 AS y2
    FROM part
),
covered AS (
    SELECT id, x1, y1, x2, y2, cx,
           unnest(generate_series(y1 // {G_GRID}, y2 // {G_GRID})) AS cy
    FROM (
        SELECT id, x1, y1, x2, y2,
               unnest(generate_series(x1 // {G_GRID}, x2 // {G_GRID})) AS cx
        FROM rects
    )
),
j AS (
    SELECT a.id AS aid, a.x1 AS ax1, a.y1 AS ay1, a.x2 AS ax2, a.y2 AS ay2,
           b.id AS bid, b.x1 AS bx1, b.y1 AS by1, b.x2 AS bx2, b.y2 AS by2,
           a.cx AS acx, a.cy AS acy
    FROM covered a JOIN covered b
      ON a.cx = b.cx AND a.cy = b.cy AND a.id < b.id
),
kept AS (
    SELECT greatest(ax1, bx1) AS ox1, greatest(ay1, by1) AS oy1,
           least(ax2, bx2) AS ox2, least(ay2, by2) AS oy2
    FROM j
    WHERE greatest(ax1, bx1) <= least(ax2, bx2)
      AND greatest(ay1, by1) <= least(ay2, by2)
      AND greatest(ax1, bx1) // {G_GRID} = acx
      AND greatest(ay1, by1) // {G_GRID} = acy
)
SELECT (SELECT count(*) FROM rects)::BIGINT AS n_rects,
       count(*)::BIGINT AS n_pairs,
       coalesce(sum((ox2 - ox1) * (oy2 - oy1)), 0)::BIGINT AS total_area
FROM kept
"""

QUERIES = {
    "segment_intersect": q_segment_intersect,
    "rect_overlap": q_rect_overlap,
}

ORACLES = {
    "segment_intersect": _SEG_SQL,
    "rect_overlap": _RECT_SQL,
}
