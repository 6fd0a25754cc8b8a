"""Batch 23: hand-computed fixtures for the remaining TPC-H shapes —
Q13's zero-order customers, Q18's HAVING threshold, Q19's OR-of-ANDs
residual, and Q22's exact-integer above-average + anti-join."""

import datetime

from ocr_to_csv_spark.functions.tpch3 import (
    Q13_EXCLUDE_PRIO,
    Q18_QTY,
    Q22_CUTOFF,
    q_cust_order_dist,
    q_disjunctive_pred,
    q_dormant_customers,
    q_large_volume_cust,
)

TS = datetime.datetime


def _write(spark, tmp_path, **tables):
    schemas = {
        "lineitem": (
            "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
            " l_linenumber bigint, l_quantity double, l_extendedprice double,"
            " l_discount double, l_tax double, l_returnflag string,"
            " l_linestatus string, l_shipdate timestamp"
        ),
        "orders": (
            "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
        ),
        "customer": (
            "c_custkey bigint, c_name string, c_nationkey bigint,"
            " c_acctbal double, c_mktsegment string"
        ),
        "part": (
            "p_partkey bigint, p_name string, p_brand string, p_type string,"
            " p_size bigint, p_retailprice double"
        ),
    }
    for name, rows in tables.items():
        spark.createDataFrame(rows, schemas[name]).write.parquet(
            str(tmp_path / f"{name}.parquet")
        )
    return str(tmp_path)


def _li(ok, qty=1.0, price=100.0, disc=0.0, pk=1):
    return (ok, pk, 1, 1, qty, price, disc, 0.0, "N", "O", TS(1996, 6, 1))


def test_cust_order_dist_counts_zero_order_customers(spark, tmp_path):
    sf = _write(
        spark, tmp_path,
        customer=[
            (1, "Customer#000000001", 0, 0.0, "BUILDING"),
            (2, "Customer#000000002", 0, 0.0, "BUILDING"),
            (3, "Customer#000000003", 0, 0.0, "BUILDING"),
        ],
        orders=[
            # cust 1: two counting orders + one excluded-priority order
            (10, 1, "O", 1.0, TS(1996, 1, 1), "1-URGENT"),
            (11, 1, "O", 1.0, TS(1996, 1, 2), "3-MEDIUM"),
            (12, 1, "O", 1.0, TS(1996, 1, 3), Q13_EXCLUDE_PRIO),
            # cust 2: only an excluded order → still a customer, count 0
            (13, 2, "O", 1.0, TS(1996, 1, 4), Q13_EXCLUDE_PRIO),
            # cust 3: no orders at all → count 0
        ],
    )
    rows = {r["c_count"]: r["custdist"] for r in q_cust_order_dist(spark, sf).collect()}
    assert rows == {2: 1, 0: 2}


def test_large_volume_threshold_is_strict(spark, tmp_path):
    at = [_li(1, qty=Q18_QTY / 2.0), _li(1, qty=Q18_QTY / 2.0)]  # == T: out
    above = [_li(2, qty=float(Q18_QTY)), _li(2, qty=1.0)]  # T+1: in
    sf = _write(
        spark, tmp_path,
        lineitem=at + above,
        orders=[
            (1, 1, "O", 10.0, TS(1996, 1, 1), "1-URGENT"),
            (2, 1, "O", 20.0, TS(1996, 1, 2), "1-URGENT"),
        ],
        customer=[(1, "Customer#000000001", 0, 0.0, "BUILDING")],
    )
    got = q_large_volume_cust(spark, sf).collect()
    assert [(r["o_orderkey"], r["sum_qty"]) for r in got] == [(2, Q18_QTY + 1)]
    assert got[0]["totalprice_cents"] == 2000


def test_disjunctive_residual_requires_matching_branch(spark, tmp_path):
    sf = _write(
        spark, tmp_path,
        part=[
            (1, "p1", "Brand#12", "PROMO", 3, 1.0),   # branch 1 part
            (2, "p2", "Brand#23", "PROMO", 8, 1.0),   # branch 2 part
            (3, "p3", "Brand#99", "PROMO", 3, 1.0),   # no branch
        ],
        lineitem=[
            _li(1, qty=5.0, price=10.0, pk=1),    # brand12 + qty 1..11 → in
            _li(1, qty=15.0, price=10.0, pk=1),   # brand12 but qty 15 → OUT
            _li(1, qty=15.0, price=20.0, pk=2),   # brand23 + qty 10..20 → in
            _li(1, qty=5.0, price=10.0, pk=2),    # brand23 but qty 5 → OUT
            _li(1, qty=5.0, price=999.0, pk=3),   # brand99 → OUT
        ],
    )
    row = q_disjunctive_pred(spark, sf).collect()[0]
    assert row["n_lines"] == 2
    assert row["revenue"] == 30.0  # 10 + 20, zero discount


def test_dormant_above_avg_and_anti_join(spark, tmp_path):
    cutoff = TS.fromisoformat(Q22_CUTOFF)
    sf = _write(
        spark, tmp_path,
        customer=[
            # positive balances: 100.00, 200.00, 600.00 → avg 300.00
            (1, "Customer#000000001", 0, 100.00, "B"),   # below avg → out
            (2, "Customer#000000002", 0, 200.00, "B"),   # below avg → out
            (3, "Customer#000000003", 0, 600.00, "B"),   # above, dormant → IN
            (4, "Customer#000000004", 0, 600.00, "B"),   # above, recent → out
            (5, "Customer#000000005", 0, -50.00, "B"),   # negative → out
        ],
        orders=[
            # cust 4 ordered after the cutoff → not dormant
            (10, 4, "O", 1.0, cutoff, "1-URGENT"),
            # cust 3's only order predates the cutoff → still dormant
            (11, 3, "O", 1.0, TS(1996, 1, 1), "1-URGENT"),
        ],
    )
    got = q_dormant_customers(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["cntrycode"], r["numcust"], r["totacctbal"]) == ("03", 1, 600.0)
