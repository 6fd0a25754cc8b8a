"""Batch 69: hand-computed fixtures for sorted-neighborhood blocking
and mean reciprocal rank."""

import datetime

from ocr_to_csv_spark.functions.erops import (
    SNM_MATCH_CENTS,
    SNM_WINDOW,
    q_mrr_eval,
    q_snm_pairs,
)

CUST_SCHEMA = (
    "c_custkey bigint, c_name string, c_nationkey bigint, "
    "c_acctbal double, c_mktsegment string"
)
ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def test_snm_pairs_window_and_match(spark, tmp_path):
    # sorted order (seg, cents): A10 A20 A10000 B15
    custs = [
        (1, "a", 0, 0.10, "A"),
        (2, "b", 0, 0.20, "A"),
        (3, "c", 0, 100.00, "A"),
        (4, "d", 0, 0.15, "B"),
    ]
    spark.createDataFrame(custs, CUST_SCHEMA).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    rows = q_snm_pairs(spark, str(tmp_path)).collect()
    pairs = {(r["key_a"], r["key_b"]): r for r in rows}
    # window 3 over 4 records → all C(4,2)=6 ordered-adjacent pairs
    assert len(rows) == 3 + 2 + 1
    r12 = pairs[(1, 2)]
    assert (r12["rank_dist"], r12["cents_dist"], r12["same_seg"]) == (1, 10, 1)
    assert r12["is_match"] == 1  # 10 cents ≤ threshold
    r13 = pairs[(1, 3)]
    assert r13["cents_dist"] == 10000 - 10
    assert r13["is_match"] == 0  # same segment but too far
    r34 = pairs[(3, 4)]
    assert r34["same_seg"] == 0 and r34["is_match"] == 0


def test_snm_catches_cross_bucket_neighbors(spark, tmp_path):
    # two balances straddling a round bucket boundary still pair
    custs = [
        (1, "a", 0, 1999.99, "A"),
        (2, "b", 0, 2000.01, "A"),
    ]
    spark.createDataFrame(custs, CUST_SCHEMA).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    rows = q_snm_pairs(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["cents_dist"] == 2 and rows[0]["is_match"] == 1


def test_mrr_hand_computed(spark, tmp_path):
    ts = datetime.datetime(1995, 1, 1)
    orders = [
        # cust 1: prices 300,200,100 — urgent is the 2nd-ranked → rr 1/2
        (1, 1, "O", 300.0, ts, "5-LOW"),
        (2, 1, "O", 200.0, ts, "1-URGENT"),
        (3, 1, "O", 100.0, ts, "1-URGENT"),  # later urgent ignored (min rank)
        # cust 2: top order urgent → rr 1
        (4, 2, "O", 500.0, ts, "1-URGENT"),
        (5, 2, "O", 400.0, ts, "5-LOW"),
        # cust 3: no urgent → excluded from MRR
        (6, 3, "O", 900.0, ts, "5-LOW"),
    ]
    spark.createDataFrame(orders, ORDERS_SCHEMA).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    row = q_mrr_eval(spark, str(tmp_path)).collect()[0]
    assert row["n_queries"] == 2
    assert row["rr_sum"] == 0.5 + 1.0
    assert row["mrr"] == 1.5 / 2
