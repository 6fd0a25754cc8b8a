"""Batch 45: hand-computed fixtures for the two-sample KS statistic,
seasonal decomposition (a linear series has zero detrended signal),
and the chi² contingency deviations."""

import datetime

from ocr_to_csv_spark.functions.statsops2 import (
    q_chi2_cells,
    q_ks_test,
    q_seasonal_decompose,
)

ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
CUST_SCHEMA = (
    "c_custkey bigint, c_name string, c_nationkey bigint, "
    "c_acctbal double, c_mktsegment string"
)


def _write(spark, tmp_path, orders, custs):
    spark.createDataFrame(orders, ORDERS_SCHEMA).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    spark.createDataFrame(custs, CUST_SCHEMA).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    return str(tmp_path)


def _order(k, cust, price, day=1, prio="1-URGENT"):
    return (k, cust, "O", price, datetime.datetime(1995, 1, day), prio)


def test_ks_test_hand_computed(spark, tmp_path):
    custs = [
        (1, "a", 0, 0.0, "BUILDING"), (2, "b", 0, 0.0, "MACHINERY"),
        (3, "c", 0, 0.0, "FURNITURE"),  # ignored segment
    ]
    orders = [
        _order(1, 1, 150.0), _order(2, 1, 250.0), _order(3, 1, 350.0),
        _order(4, 2, 250.0), _order(5, 2, 450.0),
        _order(6, 3, 250.0),  # ignored
    ]
    # buckets A={1,2,3}, B={2,4}: max |F1*n2 - F2*n1| at val 3 → 3/(3*2)
    sf = _write(spark, tmp_path, orders, custs)
    row = q_ks_test(spark, sf).collect()[0]
    assert (row["d_num"], row["n1"], row["n2"]) == (3, 3, 2)


def test_seasonal_decompose_linear_series_is_trend_only(spark, tmp_path):
    orders = [
        _order(k, 1, 10.0 * (k + 1), day=k + 1) for k in range(9)
    ]
    custs = [(1, "a", 0, 0.0, "BUILDING")]
    sf = _write(spark, tmp_path, orders, custs)
    got = q_seasonal_decompose(spark, sf).orderBy("day").collect()
    assert len(got) == 3  # only days 4..6 have full 7-day windows
    # a linear daily series is pure trend: zero detrended, zero residual
    assert [r["detr7"] for r in got] == [0, 0, 0]
    assert [r["resid_num"] for r in got] == [0, 0, 0]
    assert [r["cents"] for r in got] == [4000, 5000, 6000]
    assert [r["trend_sum7"] for r in got] == [28000, 35000, 42000]


def test_chi2_cells_hand_computed(spark, tmp_path):
    custs = [(1, "a", 0, 0.0, "A"), (2, "b", 0, 0.0, "B")]
    orders = [
        _order(1, 1, 1.0, prio="p1"), _order(2, 1, 1.0, prio="p1"),
        _order(3, 1, 1.0, prio="p2"),
        _order(4, 2, 1.0, prio="p1"),
        _order(5, 2, 1.0, prio="p2"), _order(6, 2, 1.0, prio="p2"),
    ]
    sf = _write(spark, tmp_path, orders, custs)
    got = {(r["seg"], r["prio"]): r for r in q_chi2_cells(spark, sf).collect()}
    assert len(got) == 4
    for (seg, prio), r in got.items():
        assert (r["row_tot"], r["col_tot"], r["n_total"]) == (3, 3, 6)
        assert r["dev_sq"] == 9  # |obs*6 - 9| = 3 in every cell
    assert got[("A", "p1")]["obs"] == 2
    assert got[("B", "p2")]["obs"] == 2
