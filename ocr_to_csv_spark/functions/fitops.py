"""Robust/monotone fitting, batch 76: integer-exact RANSAC consensus
line fit and exact isotonic regression (PAVA) over score bins.

Scale design (100 TB):
- ``ransac_fit`` (Fischler & Bolles 1981): the distributed RANSAC
  shape — a FIXED number of candidate models (32, from deterministic
  key pairs, data-size-independent like real RANSAC's fixed iteration
  budget) is broadcast; inlier counting is ONE map-side pass over the
  points (32 counters per partition, partial-agg'd); the winner's
  consensus set is then refit by exact integer least squares
  (slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) shipped as int64
  numerator/denominator — no float crosses engines). The inlier test
  is the cross-multiplied point-to-line residual
  |dy·(x−x1) − (y−y1)·dx| ≤ EPS·|dx| — pure int64, no division, so
  the consensus count is exact in both engines. Points are synthesized
  from customer keys with a planted line y=3x+7 and a 10% planted
  outlier class, so the fit is analytically known and test-pinned.
- ``isotonic_fit``: exact weighted isotonic regression of the
  urgent-order rate over 16 price bins via the minimax closed form of
  PAVA's unique solution (Robertson–Wright–Dykstra):
      fit_i = max_{j≤i} min_{k≥i} (P_k − P_{j−1}) / (N_k − N_{j−1})
  with P/N the cumulative (positives, counts). The bin table is
  FIXED-width (16 rows — a constant of the query, not of data size),
  so the j×i×k enumeration is a bounded ≤16³ cross confined to the
  bin table; everything upstream is one map-side groupBy. Pool means
  are IEEE-exact divisions of int64s rounded 9dp in both engines
  (wilson_rank precedent); an independent pure-Python pooling PAVA
  mirrors it in tests.

Reference parity: no fitting layer in the reference; completes the
calibration stack (calibration_bins → isotonic_fit is the standard
calibrator actually fit in production ranking systems) and the robust
stack (theil_sen, mad_outliers → ransac_fit is the high-breakdown
alternative when outliers are structured).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import table

RANSAC_MODELS = 32
RANSAC_EPS = 0  # planted inliers are exactly on the line
ISO_BINS = 16
ISO_WIDTH = 2_500_000  # cents per bin; last bin catches the tail


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic RANSAC point cloud from customer keys: planted
    line y = 3x + 7 with x = k % 997; keys divisible by 10 are the
    planted structured-outlier class."""
    c = table(spark, sf_dir, "customer")
    k = F.col("c_custkey").cast("long")
    x = (k % 997).alias("x")
    y = F.when(k % 10 == 0, (k * 37) % 5000).otherwise(
        (k % 997) * 3 + 7
    ).alias("y")
    return c.select(k.alias("k"), x, y)


_POINTS_SQL = """
    SELECT c_custkey::BIGINT AS k, c_custkey % 997 AS x,
           CASE WHEN c_custkey % 10 = 0 THEN (c_custkey * 37) % 5000
                ELSE (c_custkey % 997) * 3 + 7 END AS y
    FROM customer
"""


def _models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32 candidate lines through the deterministic key pairs
    (2i, 2i+1), i < 32 — fixed count, like RANSAC's iteration budget."""
    p = _points(spark, sf_dir).filter(F.col("k") < 2 * RANSAC_MODELS)
    a = p.filter(F.col("k") % 2 == 0).select(
        (F.col("k") / 2).cast("long").alias("model_id"),
        F.col("x").alias("x1"), F.col("y").alias("y1"),
    )
    b = p.filter(F.col("k") % 2 == 1).select(
        ((F.col("k") - 1) / 2).cast("long").alias("model_id"),
        F.col("x").alias("x2"), F.col("y").alias("y2"),
    )
    m = a.join(b, "model_id")
    return m.select(
        "model_id", "x1", "y1",
        (F.col("y2") - F.col("y1")).alias("dy"),
        (F.col("x2") - F.col("x1")).alias("dx"),
    ).filter(F.col("dx") != 0)


_MODELS_SQL = f"""
    WITH pts AS ({_POINTS_SQL}),
    a AS (SELECT k // 2 AS model_id, x AS x1, y AS y1 FROM pts
          WHERE k < {2 * RANSAC_MODELS} AND k % 2 = 0),
    b AS (SELECT (k - 1) // 2 AS model_id, x AS x2, y AS y2 FROM pts
          WHERE k < {2 * RANSAC_MODELS} AND k % 2 = 1),
    models AS (
        SELECT a.model_id, x1, y1, y2 - y1 AS dy, x2 - x1 AS dx
        FROM a JOIN b USING (model_id) WHERE x2 - x1 <> 0
    )
"""


def q_ransac_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC: broadcast the 32 candidate lines, count exact integer
    consensus per model in one pass, refit the winner's inliers by
    exact integer least squares (module docstring)."""
    pts = _points(spark, sf_dir)
    models = _models(spark, sf_dir)
    resid = (
        F.col("dy") * (F.col("x") - F.col("x1"))
        - (F.col("y") - F.col("y1")) * F.col("dx")
    )
    inlier = F.abs(resid) <= F.lit(RANSAC_EPS) * F.abs(F.col("dx"))
    scored = (
        pts.crossJoin(F.broadcast(models))
        .filter(inlier)
        .groupBy("model_id", "x1", "y1", "dy", "dx")
        .agg(F.count(F.lit(1)).alias("inliers"))
    )
    pick = F.struct(
        (-F.col("inliers")).alias("ni"), F.col("model_id").alias("m")
    )
    best = scored.agg(F.min(pick).alias("b"), F.max("inliers").alias("inliers")).select(
        F.col("b.m").alias("model_id"), "inliers"
    )
    win = best.join(
        _models(spark, sf_dir), "model_id"
    )  # 1-row model parameters
    fit = (
        pts.crossJoin(F.broadcast(win))
        .filter(inlier)
        .agg(
            F.first("model_id").alias("model_id"),
            F.first("inliers").alias("inliers"),
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    return fit.select(
        "model_id",
        "inliers",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
            "slope_num"
        ),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
            "slope_den"
        ),
        (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).alias(
            "icept_num"
        ),
    )


_RANSAC_SQL = (
    _MODELS_SQL
    + f""",
    scored AS (
        SELECT m.model_id, m.x1, m.y1, m.dy, m.dx,
               count(*)::BIGINT AS inliers
        FROM pts p, models m
        WHERE abs(m.dy * (p.x - m.x1) - (p.y - m.y1) * m.dx)
              <= {RANSAC_EPS} * abs(m.dx)
        GROUP BY ALL
    ),
    best AS (
        SELECT * FROM scored ORDER BY inliers DESC, model_id LIMIT 1
    ),
    cons AS (
        SELECT b.model_id, b.inliers, p.x, p.y
        FROM pts p, best b
        WHERE abs(b.dy * (p.x - b.x1) - (p.y - b.y1) * b.dx)
              <= {RANSAC_EPS} * abs(b.dx)
    )
    SELECT model_id::BIGINT AS model_id, inliers,
           (count(*) * sum(x*y) - sum(x) * sum(y))::BIGINT AS slope_num,
           (count(*) * sum(x*x) - sum(x) * sum(x))::BIGINT AS slope_den,
           (sum(y) * sum(x*x) - sum(x) * sum(x*y))::BIGINT AS icept_num
    FROM cons GROUP BY model_id, inliers
"""
)


def _bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    b = F.least(F.lit(ISO_BINS - 1), (cents / ISO_WIDTH).cast("long"))
    return (
        o.select(
            b.alias("bin"),
            (F.col("o_orderpriority") == "1-URGENT").cast("long").alias("pos"),
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("pos").alias("p"))
    )


def q_isotonic_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact isotonic (non-decreasing) fit of the urgent rate over the
    16 price bins via the PAVA minimax closed form (module docstring)."""
    bins = _bins(spark, sf_dir)
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin", "n", "p",
        F.sum("n").over(w).alias("cn"),
        F.sum("p").over(w).alias("cp"),
    ).localCheckpoint()  # 16 rows; reused three ways below
    i = cum.select(F.col("bin").alias("i"), "n", "p")
    j = cum.select(
        F.col("bin").alias("j"),
        (F.col("cn") - F.col("n")).alias("cn_jm1"),
        (F.col("cp") - F.col("p")).alias("cp_jm1"),
    )
    k = cum.select(
        F.col("bin").alias("k"),
        F.col("cn").alias("cn_k"),
        F.col("cp").alias("cp_k"),
    )
    trip = (
        i.crossJoin(F.broadcast(j))
        .filter(F.col("j") <= F.col("i"))
        .crossJoin(F.broadcast(k))
        .filter(F.col("k") >= F.col("i"))
    )
    frac = (F.col("cp_k") - F.col("cp_jm1")) / (
        (F.col("cn_k") - F.col("cn_jm1")).cast("double")
    )
    inner = trip.groupBy("i", "n", "p", "j").agg(F.min(frac).alias("mn"))
    fit = inner.groupBy("i", "n", "p").agg(
        F.round(F.max("mn"), 9).alias("fit")
    )
    return fit.select(F.col("i").alias("bin"), "n", "p", "fit")


_ISO_SQL = f"""
WITH bins AS (
    SELECT least({ISO_BINS - 1},
                 CAST(round(o_totalprice * 100) AS BIGINT) // {ISO_WIDTH})
               AS bin,
           count(*)::BIGINT AS n,
           sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               ::BIGINT AS p
    FROM orders GROUP BY 1
),
cum AS (
    SELECT bin, n, p,
           sum(n) OVER (ORDER BY bin) AS cn,
           sum(p) OVER (ORDER BY bin) AS cp
    FROM bins
),
trip AS (
    SELECT i.bin AS i, i.n, i.p, j.bin AS j,
           (k.cp - (j.cp - j.p)) / CAST(k.cn - (j.cn - j.n) AS DOUBLE)
               AS frac
    FROM cum i, cum j, cum k
    WHERE j.bin <= i.bin AND k.bin >= i.bin
),
inner_ AS (
    SELECT i, n, p, j, min(frac) AS mn FROM trip GROUP BY i, n, p, j
)
SELECT i::BIGINT AS bin, n, p, round(max(mn), 9) AS fit
FROM inner_ GROUP BY i, n, p
"""


QUERIES = {
    "ransac_fit": q_ransac_fit,
    "isotonic_fit": q_isotonic_fit,
}

ORACLES = {
    "ransac_fit": _RANSAC_SQL,
    "isotonic_fit": _ISO_SQL,
}
