"""Batch 85: DTW + LCS nested-fold DP operators."""

SF = "/root/testdata/sf0.001"


def _py_dtw(a, b):
    INF = 10**12
    prev = [0] + [INF] * len(b)
    for av in a:
        row = [INF]
        for j, bv in enumerate(b, start=1):
            row.append(abs(av - bv) + min(prev[j - 1], prev[j], row[-1]))
        prev = row
    return prev[-1]


def _py_lcs(a, b, bucket):
    prev = [0] * (len(b) + 1)
    for av in a:
        row = [0]
        for j, bv in enumerate(b, start=1):
            if av // bucket == bv // bucket:
                row.append(prev[j - 1] + 1)
            else:
                row.append(max(prev[j], row[-1]))
        prev = row
    return prev[-1]


def test_dtw_textbook_properties():
    assert _py_dtw([1, 2, 3], [1, 2, 3]) == 0
    # elasticity: a repeated sample aligns at zero cost
    assert _py_dtw([1, 2, 3], [1, 2, 2, 3]) == 0
    assert _py_dtw([0, 0, 0], [1, 1]) == 3
    assert _py_dtw([5], [1, 2]) == 7  # single sample matches everything


def test_fold_columns_match_python_on_planted_series(spark):
    """The codegen folds equal the python DP on hand-planted arrays,
    including unequal lengths and the repeated-sample case."""
    from pyspark.sql import functions as F

    from ocr_to_csv_spark.functions.temporal2 import (
        LCS_BUCKET,
        _dtw_col,
        _lcs_col,
    )

    cases = [
        ([1, 2, 3], [1, 2, 2, 3]),
        ([0, 0, 0], [1, 1]),
        ([5], [1, 2]),
        ([7, 1, 9, 4], [2, 7, 7, 1]),
        ([10, 20, 30, 40, 50], [50, 40, 30, 20, 10]),
    ]
    df = spark.createDataFrame(
        [(a, b) for a, b in cases], "xa array<long>, xb array<long>"
    )
    got = df.select(
        _dtw_col(F.col("xa"), F.col("xb")).alias("dtw"),
        _lcs_col(F.col("xa"), F.col("xb")).alias("lcs"),
    ).collect()
    for (a, b), r in zip(cases, got):
        assert r.dtw == _py_dtw(a, b), (a, b)
        assert r.lcs == _py_lcs(a, b, LCS_BUCKET), (a, b)


def test_dtw_dist_matches_python_over_sf(spark):
    """End-to-end: per-type day series rebuilt in pandas, DP mirrored."""
    import glob
    import math

    import pandas as pd

    from ocr_to_csv_spark.functions.temporal2 import (
        LCS_BUCKET,
        q_dtw_dist,
        q_lcs_series,
    )

    files = sorted(glob.glob(f"{SF}/events.parquet")) or sorted(
        glob.glob(f"{SF}/events.parquet/*.parquet")
    )
    e = pd.concat(
        pd.read_parquet(f, columns=["ts", "event_type"]) for f in files
    )
    series = {}
    for typ, grp in e.groupby("event_type"):
        days = (
            grp.ts.map(lambda t: math.floor(t.timestamp() / 86400))
            .value_counts()
            .sort_index()
        )
        series[typ] = list(days.values)
    types = sorted(series)
    want_dtw = {}
    want_lcs = {}
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            want_dtw[(ta, tb)] = _py_dtw(series[ta], series[tb])
            want_lcs[(ta, tb)] = _py_lcs(series[ta], series[tb], LCS_BUCKET)
    got_d = {
        (r.type_a, r.type_b): r.dtw for r in q_dtw_dist(spark, SF).collect()
    }
    got_l = {
        (r.type_a, r.type_b): r.lcs
        for r in q_lcs_series(spark, SF).collect()
    }
    assert got_d == want_dtw
    assert got_l == want_lcs
    assert any(v > 0 for v in got_d.values())
