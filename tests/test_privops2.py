"""Batch 61: hand-computed fixtures for t-closeness and randomized
response."""

import datetime
import hashlib

from ocr_to_csv_spark.functions.privops2 import (
    RR_LIE_MOD,
    q_rand_response,
    q_t_closeness,
)

CUST_SCHEMA = (
    "c_custkey bigint, c_name string, c_nationkey bigint, "
    "c_acctbal double, c_mktsegment string"
)
ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def test_t_closeness_hand_computed(spark, tmp_path):
    # class (nation 0): 100% AUTO; class (nation 1): 100% BUILD;
    # global is 50/50  →  variational distance 0.5 for both classes
    custs = [
        (1, "a", 0, 10.0, "AUTO"),
        (2, "b", 0, 20.0, "AUTO"),
        (3, "c", 1, 10.0, "BUILD"),
        (4, "d", 1, 20.0, "BUILD"),
    ]
    spark.createDataFrame(custs, CUST_SCHEMA).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    rows = q_t_closeness(spark, str(tmp_path)).collect()
    assert len(rows) == 2
    for r in rows:
        # num = |2*4-2*2| + |0*4-2*2| = 8 ; den = 2*2*4 = 16
        assert (r["n_class"], r["t_num"], r["t_den"]) == (2, 8, 16)
        assert r["t"] == 0.5


def test_t_closeness_uniform_class_is_zero(spark, tmp_path):
    # a class whose distribution equals the global one has t = 0
    custs = [
        (1, "a", 0, 10.0, "AUTO"),
        (2, "b", 0, 20.0, "BUILD"),
        (3, "c", 1, 10.0, "AUTO"),
        (4, "d", 1, 20.0, "BUILD"),
    ]
    spark.createDataFrame(custs, CUST_SCHEMA).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    rows = q_t_closeness(spark, str(tmp_path)).collect()
    assert all(r["t_num"] == 0 and r["t"] == 0.0 for r in rows)


def _lies(key: int) -> bool:
    h = int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)
    return h % RR_LIE_MOD == 0


def test_rand_response_estimator(spark, tmp_path):
    ts = datetime.datetime(1995, 1, 1)
    orders = [
        (k, 1, "O", 100.0, ts, "1-URGENT" if k % 2 == 0 else "5-LOW")
        for k in range(1, 41)
    ]
    spark.createDataFrame(orders, ORDERS_SCHEMA).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    row = q_rand_response(spark, str(tmp_path)).collect()[0]
    n = 40
    true_cnt = 20
    reported = sum(
        ((k % 2 == 0) != _lies(k)) for k in range(1, 41)
    )
    assert (row["n"], row["true_cnt"], row["reported_cnt"]) == (
        n,
        true_cnt,
        reported,
    )
    assert row["est_num"] == 4 * reported - n
    assert row["estimate"] == (4 * reported - n) / 2.0
