"""Batch 19: hand-computed fixtures for Q7 bilateral nation volume,
Q9 profit-by-nation, Spearman rank sums, and the weighted median
crossing point."""

import datetime

from pyspark.sql import functions as F

from ocr_to_csv_spark.functions.statsops import (
    q_spearman_ranks,
    q_weighted_median,
)
from ocr_to_csv_spark.functions.tpch import (
    q_nation_volume,
    q_profit_by_nation,
)

TS = datetime.datetime


def _tpch(spark, tmp_path, lineitem, orders, customer, supplier, nation, part):
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
        "supplier": "s_suppkey bigint, s_name string, s_nationkey bigint, s_acctbal double",
        "nation": "n_nationkey bigint, n_name string, n_regionkey bigint",
        "part": (
            "p_partkey bigint, p_name string, p_brand string, p_type string,"
            " p_size bigint, p_retailprice double"
        ),
    }
    for name, rows in [
        ("lineitem", lineitem), ("orders", orders), ("customer", customer),
        ("supplier", supplier), ("nation", nation), ("part", part),
    ]:
        spark.createDataFrame(rows, schemas[name]).write.parquet(
            str(tmp_path / f"{name}.parquet")
        )
    return str(tmp_path)


def test_nation_volume_directions_and_cents(spark, tmp_path):
    ship = TS(1996, 6, 1)
    sf = _tpch(
        spark, tmp_path,
        lineitem=[
            # supp nation 1 → cust nation 2: 100.00 at 10% → 90.00
            (1, 1, 1, 1, 1.0, 100.00, 0.10, 0.0, "N", "O", ship),
            # supp nation 2 → cust nation 1: 50.00 at 0% → 50.00
            (2, 1, 2, 1, 1.0, 50.00, 0.00, 0.0, "N", "O", ship),
            # supp nation 1 → cust nation 1: same-nation, excluded
            (3, 1, 1, 1, 1.0, 70.00, 0.00, 0.0, "N", "O", ship),
        ],
        orders=[
            (1, 20, "O", 1.0, ship, "1"),
            (2, 10, "O", 1.0, ship, "1"),
            (3, 10, "O", 1.0, ship, "1"),
        ],
        customer=[(10, "a", 1, 0.0, "B"), (20, "b", 2, 0.0, "B")],
        supplier=[(1, "s1", 1, 0.0), (2, "s2", 2, 0.0)],
        nation=[(1, "NATION_1", 0), (2, "NATION_2", 0)],
        part=[(1, "blue widget", "B", "T", 1, 1.00)],
    )
    got = {
        (r["supp_nation"], r["cust_nation"], r["l_year"]): (
            r["volume"], r["n_lines"]
        )
        for r in q_nation_volume(spark, sf).collect()
    }
    assert got == {
        ("NATION_1", "NATION_2", 1996): (90.0, 1),
        ("NATION_2", "NATION_1", 1996): (50.0, 1),
    }


def test_profit_by_nation_formula_and_part_filter(spark, tmp_path):
    ship = TS(1997, 3, 1)
    sf = _tpch(
        spark, tmp_path,
        lineitem=[
            # widget part: profit = 100*(1-0.1) - 2*30 = 90 - 60 = 30
            (1, 1, 1, 1, 2.0, 100.00, 0.10, 0.0, "N", "O", ship),
            # bolt part: filtered out by name token
            (2, 2, 1, 1, 1.0, 500.00, 0.00, 0.0, "N", "O", ship),
        ],
        orders=[(1, 10, "O", 1.0, ship, "1"), (2, 10, "O", 1.0, ship, "1")],
        customer=[(10, "a", 1, 0.0, "B")],
        supplier=[(1, "s1", 1, 0.0)],
        nation=[(1, "NATION_1", 0)],
        part=[
            (1, "red widget", "B", "T", 1, 30.00),
            (2, "red bolt", "B", "T", 1, 1.00),
        ],
    )
    rows = q_profit_by_nation(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["nation"], r["o_year"], r["profit"], r["n_lines"]) == (
        "NATION_1", 1997, 30.0, 1,
    )


def _docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_spearman_perfect_and_reversed(spark, tmp_path):
    # token counts 1,2,3 align with n_chars 10,20,30 → Σd² = 0
    sf = _docs(
        spark, tmp_path,
        [(0, "a", "en", "s", 10), (1, "a b", "en", "s", 20),
         (2, "a b c", "en", "s", 30)],
    )
    r = q_spearman_ranks(spark, sf).collect()[0]
    assert (r["n"], r["sum_d2"]) == (3, 0)

    # reversed: n_chars 30,20,10 vs tokens 1,2,3 → ranks (3,1),(2,2),(1,3)
    sf2 = _docs(
        spark, tmp_path / "rev",
        [(0, "a", "en", "s", 30), (1, "a b", "en", "s", 20),
         (2, "a b c", "en", "s", 10)],
    )
    r2 = q_spearman_ranks(spark, sf2).collect()[0]
    assert (r2["n"], r2["sum_d2"]) == (3, 8)  # 4 + 0 + 4


def test_weighted_median_crossing(spark, tmp_path):
    # docs by n_chars asc: (10, w=1), (20, w=1), (30, w=6)
    # total 8; half 4 → crossing at n_chars=30 (cumw 2 < 4 before)
    sf = _docs(
        spark, tmp_path,
        [(0, "a", "en", "s", 10), (1, "b", "en", "s", 20),
         (2, "a b c d e f", "en", "s", 30)],
    )
    r = q_weighted_median(spark, sf).collect()[0]
    assert (r["wmedian_chars"], r["cumw"], r["totw"]) == (30, 8, 8)
