"""Batch 63: hand-computed fixtures for A-priori triples and
association rules."""

import datetime

from ocr_to_csv_spark.functions.basketops import (
    q_assoc_rules,
    q_frequent_triples,
)

LI_SCHEMA = (
    "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
    "l_linenumber bigint, l_quantity double, l_extendedprice double, "
    "l_discount double, l_tax double, l_returnflag string, "
    "l_linestatus string, l_shipdate timestamp"
)


def _li(ok, part, ln):
    return (
        ok, part, 1, ln, 1.0, 10.0, 0.0, 0.0, "N", "O",
        datetime.datetime(1995, 1, 1),
    )


def _write(spark, tmp_path, baskets):
    rows = [
        _li(ok, p, i)
        for ok, parts in baskets.items()
        for i, p in enumerate(parts, start=1)
    ]
    spark.createDataFrame(rows, LI_SCHEMA).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    return str(tmp_path)


def test_frequent_triples_hand_computed(spark, tmp_path):
    # {1,2,3} appears in two baskets → support 2; {1,2,4} once → pruned
    baskets = {
        10: [1, 2, 3],
        20: [1, 2, 3, 5],
        30: [1, 2, 4],
        40: [9],
    }
    sf = _write(spark, tmp_path, baskets)
    rows = q_frequent_triples(spark, sf).collect()
    assert [(r["pa"], r["pb"], r["pc"], r["sup"]) for r in rows] == [
        (1, 2, 3, 2)
    ]


def test_frequent_triples_duplicate_lines_count_once(spark, tmp_path):
    # the same part twice in one order must not double-count support
    baskets = {10: [1, 2, 3, 3], 20: [1, 2, 3]}
    sf = _write(spark, tmp_path, baskets)
    rows = q_frequent_triples(spark, sf).collect()
    assert [(r["pa"], r["pb"], r["pc"], r["sup"]) for r in rows] == [
        (1, 2, 3, 2)
    ]


def test_assoc_rules_confidence_and_lift(spark, tmp_path):
    # 4 baskets; pair {1,2} in 2 of them; item 1 in 3, item 2 in 2
    baskets = {
        10: [1, 2],
        20: [1, 2],
        30: [1],
        40: [3],
    }
    sf = _write(spark, tmp_path, baskets)
    rows = {(r["lhs"], r["rhs"]): r for r in q_assoc_rules(spark, sf).collect()}
    assert set(rows) == {(1, 2), (2, 1)}
    r12 = rows[(1, 2)]
    assert (r12["sup"], r12["lhs_sup"], r12["rhs_sup"], r12["n_baskets"]) == (
        2, 3, 2, 4,
    )
    assert r12["confidence"] == 2 / 3
    assert (r12["lift_num"], r12["lift_den"]) == (8, 6)
    assert r12["lift"] == 8 / 6
    r21 = rows[(2, 1)]
    assert r21["confidence"] == 1.0
    assert r21["lift"] == 8 / 6
