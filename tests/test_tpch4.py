"""Batch 33: hand-computed fixtures for the four partsupp-derived
TPC-H shapes — Q2 min-cost tie + region exclusion, Q11 strict
global-fraction threshold, Q16 anti-join exclusion + distinct supplier
count, Q20 excess-stock semi-join chain."""

import datetime

from ocr_to_csv_spark.functions.tpch4 import (
    q_important_stock,
    q_min_cost_supplier,
    q_promo_part_suppliers,
    q_supplier_part_count,
)

TS = datetime.datetime

SCHEMAS = {
    "lineitem": (
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber bigint, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp"
    ),
    "supplier": "s_suppkey bigint, s_name string, s_nationkey bigint, s_acctbal double",
    "nation": "n_nationkey bigint, n_name string, n_regionkey bigint",
    "region": "r_regionkey bigint, r_name string",
    "part": (
        "p_partkey bigint, p_name string, p_brand string, p_type string,"
        " p_size bigint, p_retailprice double"
    ),
}


def _li(order, part, supp, qty, price, ship):
    return (order, part, supp, 1, float(qty), float(price), 0.0, 0.0,
            "N", "O", ship)


def _fixture(spark, tmp_path):
    rows = {
        "region": [(0, "EUROPE"), (1, "ASIA")],
        "nation": [(0, "NATION_1", 0), (1, "NATION_2", 0), (2, "NATION_3", 1)],
        "supplier": [
            (1, "S#1", 0, 100.0),
            (2, "S#2", 1, 50.0),
            (3, "S#3", 2, 900.0),   # ASIA: outside Q2's region
            (4, "S#4", 0, -5.0),    # negative balance: Q16-excluded
        ],
        "part": [
            (1, "small ring", "Brand#34", "LARGE", 25, 100.0),
            (3, "small gizmo", "Brand#34", "SMALL", 7, 10.0),
            (5, "red bolt", "Brand#11", "MEDIUM", 3, 1.0),
        ],
        "lineitem": [
            # Q2: (p1,s1)/(p1,s2) tie at 1000 cents; (p1,s3) cheaper but ASIA
            _li(1, 1, 1, 5, 10.00, TS(1995, 3, 1)),
            _li(2, 1, 2, 5, 10.00, TS(1996, 6, 1)),
            _li(3, 1, 3, 5, 5.00, TS(1995, 3, 1)),
            # Q16/Q20: p3 via s1 (twice → distinct), s2 (split years), s4
            _li(4, 3, 1, 3, 7.00, TS(1995, 2, 1)),
            _li(5, 3, 1, 3, 7.00, TS(1995, 2, 2)),
            _li(6, 3, 2, 3, 7.00, TS(1996, 3, 1)),
            _li(9, 3, 2, 7, 7.00, TS(1995, 5, 5)),
            _li(7, 3, 4, 3, 7.00, TS(1995, 2, 1)),
            # Q11: a sub-threshold part (value 1 cent)
            _li(8, 5, 1, 1, 0.01, TS(1995, 1, 1)),
        ],
    }
    for name, data in rows.items():
        spark.createDataFrame(data, SCHEMAS[name]).write.parquet(
            str(tmp_path / f"{name}.parquet")
        )
    return str(tmp_path)


def test_min_cost_supplier_tie_and_region(spark, tmp_path):
    sf = _fixture(spark, tmp_path)
    got = [tuple(r) for r in q_min_cost_supplier(spark, sf).collect()]
    # s3's 500-cent offer is out-of-region; s1/s2 tie at the regional
    # minimum 1000 and both survive, acctbal-desc ordered.
    assert got == [
        (10000, "S#1", "NATION_1", 1, "small ring", 1000),
        (5000, "S#2", "NATION_2", 1, "small ring", 1000),
    ]


def test_important_stock_strict_threshold(spark, tmp_path):
    sf = _fixture(spark, tmp_path)
    got = [tuple(r) for r in q_important_stock(spark, sf).collect()]
    # NATION_1 holders are s1/s4. part3: 700·6 + 700·3 = 6300;
    # part1: 1000·5 = 5000; part5: 1·1 = 1. total = 11301.
    # Strict >: 6300·1000 and 5000·1000 pass, 1·1000 does not.
    assert got == [(3, 6300), (1, 5000)]


def test_supplier_part_count_excludes_and_dedups(spark, tmp_path):
    sf = _fixture(spark, tmp_path)
    got = [tuple(r) for r in q_supplier_part_count(spark, sf).collect()]
    # p3 (size 7) is the only size-listed part; s1 counted once despite
    # two lineitems, s4 anti-joined away → 2 suppliers.
    assert got == [("Brand#34", "SMALL", 7, 2)]


def test_promo_part_suppliers_excess_stock(spark, tmp_path):
    sf = _fixture(spark, tmp_path)
    got = [tuple(r) for r in q_promo_part_suppliers(spark, sf).collect()]
    # NATION_2 = s2. (p1,s2): avail 5, shipped-in-1996 5 → 5 > 10 fails.
    # (p3,s2): avail 10, shipped-in-1996 3 → 10 > 6 qualifies.
    assert got == [("S#2", 5000)]
