"""Batch 73: hand-computed fixtures for business-day lag and
leave-one-out target encoding."""

import datetime

from ocr_to_csv_spark.functions.calendarops import (
    q_business_days,
    q_target_encode,
)

ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
LI_SCHEMA = (
    "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
    "l_linenumber bigint, l_quantity double, l_extendedprice double, "
    "l_discount double, l_tax double, l_returnflag string, "
    "l_linestatus string, l_shipdate timestamp"
)


def _order(k, date, prio="1-URGENT"):
    return (k, 1, "O", 100.0, date, prio)


def _ship(ok, date):
    return (ok, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", date)


def test_business_days_weekend_skipped(spark, tmp_path):
    # Mon 1995-01-02 → Mon 1995-01-09 spans one weekend: 5 business days
    # Fri 1995-01-06 → Mon 1995-01-09: 1 business day
    # Sat 1995-01-07 → Sun 1995-01-08: 0 business days
    orders = [
        _order(1, datetime.datetime(1995, 1, 2)),
        _order(2, datetime.datetime(1995, 1, 6)),
        _order(3, datetime.datetime(1995, 1, 7)),
    ]
    ships = [
        _ship(1, datetime.datetime(1995, 1, 9)),
        _ship(2, datetime.datetime(1995, 1, 9)),
        _ship(3, datetime.datetime(1995, 1, 8)),
    ]
    spark.createDataFrame(orders, ORDERS_SCHEMA).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    spark.createDataFrame(ships, LI_SCHEMA).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    row = q_business_days(spark, str(tmp_path)).collect()[0]
    assert (row["n"], row["bd_sum"]) == (3, 5 + 1 + 0)
    assert (row["bd_min"], row["bd_max"]) == (0, 5)
    assert row["bd_avg"] == 6 / 3


def test_target_encode_loo_and_singleton_fallback(spark, tmp_path):
    ts = datetime.datetime(1995, 1, 2)
    orders = [
        # group A: cents 10000, 20000, 30000
        (1, 1, "O", 100.0, ts, "A"),
        (2, 1, "O", 200.0, ts, "A"),
        (3, 1, "O", 300.0, ts, "A"),
        # singleton group B: falls back to global LOO
        (4, 1, "O", 400.0, ts, "B"),
    ]
    spark.createDataFrame(orders, ORDERS_SCHEMA).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    rows = {r["o_orderkey"]: r for r in q_target_encode(spark, str(tmp_path)).collect()}
    # order 1: (20000+30000)/2
    assert (rows[1]["enc_num"], rows[1]["enc_den"]) == (50000, 2)
    assert rows[1]["enc"] == 25000.0
    # order 4 (singleton): global LOO = (100000 - 40000) / 3
    assert (rows[4]["enc_num"], rows[4]["enc_den"]) == (60000, 3)
    assert rows[4]["enc"] == 20000.0
    # no row's own target leaks: numerator is exactly the relevant
    # pool (group A sum 60000, global 100000) minus the row itself
    assert rows[2]["enc_num"] == 60000 - 20000
    assert rows[3]["enc_num"] == 60000 - 30000
    for r in rows.values():
        assert r["enc_num"] in (60000 - r["cents"], 100000 - r["cents"])
