"""Batch 72: hand-computed fixtures for Wilson lower bound and
empirical-Bayes shrinkage."""

import datetime
import math

from ocr_to_csv_spark.functions.rankstats import (
    EB_M,
    WILSON_Z,
    q_eb_shrinkage,
    q_wilson_rank,
)

LI_SCHEMA = (
    "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
    "l_linenumber bigint, l_quantity double, l_extendedprice double, "
    "l_discount double, l_tax double, l_returnflag string, "
    "l_linestatus string, l_shipdate timestamp"
)


def _li(ok, supp, flag):
    return (
        ok, 1, supp, 1, 1.0, 10.0, 0.0, 0.0, flag, "O",
        datetime.datetime(1995, 1, 1),
    )


def _write(spark, tmp_path, rows):
    spark.createDataFrame(rows, LI_SCHEMA).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    return str(tmp_path)


def _wilson(x, n):
    p = x / n
    z2 = WILSON_Z * WILSON_Z
    return round(
        (p + z2 / (2 * n) - WILSON_Z * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n)))
        / (1 + z2 / n),
        9,
    )


def test_wilson_small_sample_demoted(spark, tmp_path):
    # supplier 1: 1/1 returns (raw rate 1.0); supplier 2: 9/10 returns.
    # Wilson must rank supplier 2 ABOVE supplier 1.
    rows = [_li(1, 1, "R")] + [
        _li(10 + i, 2, "R" if i < 9 else "N") for i in range(10)
    ]
    sf = _write(spark, tmp_path, rows)
    out = q_wilson_rank(spark, sf).collect()
    assert [r["supp"] for r in out] == [2, 1]
    got = {r["supp"]: r for r in out}
    assert got[1]["raw_rate"] == 1.0
    assert got[1]["wilson_lower"] == _wilson(1, 1)
    assert got[2]["wilson_lower"] == _wilson(9, 10)
    assert got[2]["wilson_lower"] > got[1]["wilson_lower"]


def test_eb_shrinkage_pulls_toward_global(spark, tmp_path):
    # global rate 10/20 = 0.5; supplier 1 is 1/1 → shrunk toward 0.5
    rows = [_li(1, 1, "R")] + [
        _li(10 + i, 2, "R" if i < 9 else "N") for i in range(19)
    ]
    sf = _write(spark, tmp_path, rows)
    out = {r["supp"]: r for r in q_eb_shrinkage(spark, sf).collect()}
    g_n, g_x = 20, 10
    r1 = out[1]
    assert (r1["n"], r1["x"]) == (1, 1)
    num = 1 * g_n + EB_M * g_x
    den = g_n * (1 + EB_M)
    assert (r1["shrunk_num"], r1["shrunk_den"]) == (num, den)
    assert r1["shrunk_rate"] == num / den
    # shrunk strictly between global rate and raw rate
    assert 0.5 < r1["shrunk_rate"] < 1.0
