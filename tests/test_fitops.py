"""Batch 76: RANSAC consensus fit + exact isotonic regression."""

from fractions import Fraction

SF = "/root/testdata/sf0.001"


def test_ransac_recovers_planted_line(spark):
    """The winner's exact least-squares refit over its consensus set
    is exactly y = 3x + 7, and the consensus is exactly the planted
    inlier class (non-multiples of 10 — minus the coincidental
    outliers that happen to land on the line)."""
    from ocr_to_csv_spark.functions.fitops import q_ransac_fit

    r = q_ransac_fit(spark, SF).first()
    assert Fraction(r.slope_num, r.slope_den) == 3
    assert Fraction(r.icept_num, r.slope_den) == 7
    # every key k % 10 != 0 is a planted inlier; outliers may also
    # land on the line iff (k*37) % 5000 == 3*(k%997) + 7
    n = 150
    expect = 0
    for k in range(n):
        if k % 10 != 0 or (k * 37) % 5000 == 3 * (k % 997) + 7:
            expect += 1
    assert r.inliers == expect


def test_ransac_winner_beats_outlier_models(spark):
    """Models seeded by an outlier point must score far below the
    planted-line consensus (high-breakdown property)."""
    from pyspark.sql import functions as F

    from ocr_to_csv_spark.functions.fitops import (
        RANSAC_EPS,
        _models,
        _points,
    )

    pts = _points(spark, SF)
    models = _models(spark, SF)
    resid = (
        F.col("dy") * (F.col("x") - F.col("x1"))
        - (F.col("y") - F.col("y1")) * F.col("dx")
    )
    scored = (
        pts.crossJoin(F.broadcast(models))
        .filter(F.abs(resid) <= F.lit(RANSAC_EPS) * F.abs(F.col("dx")))
        .groupBy("model_id")
        .agg(F.count(F.lit(1)).alias("inliers"))
        .collect()
    )
    counts = sorted((r.inliers for r in scored), reverse=True)
    assert counts[0] > 100  # the planted line owns ~90% of 150 points
    # outlier-seeded models exist and score near-zero consensus
    assert counts[-1] < 10


def _py_pava(bins):
    """Textbook pooling PAVA: (n, p) per bin -> non-decreasing fitted
    rates, pooling adjacent violators."""
    stack = []  # (n, p) pools
    for n, p in bins:
        stack.append((n, p))
        while len(stack) > 1 and Fraction(stack[-2][1], stack[-2][0]) > Fraction(
            stack[-1][1], stack[-1][0]
        ):
            n2, p2 = stack.pop()
            n1, p1 = stack.pop()
            stack.append((n1 + n2, p1 + p2))
    # expand each pool's rate back over its member bins
    fits = []
    it = iter(stack)
    pool_n, pool_p = next(it)
    used = 0
    for n, _ in bins:
        if used == pool_n:
            pool_n, pool_p = next(it)
            used = 0
        fits.append(Fraction(pool_p, pool_n))
        used += n
    return fits


def test_isotonic_matches_textbook_pava(spark):
    """The minimax closed form equals pooling PAVA (to the shared
    9dp rounding) and is non-decreasing."""
    from ocr_to_csv_spark.functions.fitops import q_isotonic_fit

    rows = sorted(q_isotonic_fit(spark, SF).collect(), key=lambda r: r.bin)
    fits = [r.fit for r in rows]
    assert fits == sorted(fits)  # monotone
    want = _py_pava([(r.n, r.p) for r in rows])
    assert fits == [round(float(f), 9) for f in want]


def test_isotonic_hand_fixture():
    """PAVA mirror sanity on a hand-computed violator: rates
    (1/2, 0/2, 1/1) pool the first two bins to 1/4."""
    fits = _py_pava([(2, 1), (2, 0), (1, 1)])
    assert fits == [Fraction(1, 4), Fraction(1, 4), Fraction(1, 1)]
