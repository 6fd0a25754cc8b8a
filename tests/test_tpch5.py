"""Hand-computed fixtures for the partsupp shapes (tpch5.py): the
derived-partsupp formulas, Q2 min-cost ties, Q11 HAVING threshold, Q16
exclusion anti-join, Q20 half-of-shipped boundary."""

import pytest

from ocr_to_csv_spark.functions.tpch5 import (
    PS_PER_PART,
    partsupp,
    q_excess_stock_suppliers,
    q_min_cost_supplier,
    q_parts_supplier_cnt,
    q_value_share,
)

pytestmark = pytest.mark.usefixtures("spark")


def _dims(spark, tmp_path, n_part=6, n_supp=4):
    spark.createDataFrame(
        [
            (k, f"name{k}", f"Brand#{k % 3}", "SMALL" if k % 2 else "ECONOMY",
             5 if k % 2 else 9, 10.0 + k)
            for k in range(n_part)
        ],
        "p_partkey bigint, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).write.parquet(str(tmp_path / "part.parquet"))
    spark.createDataFrame(
        [(k, f"Supplier#{k}", k % 2, 100.0 * k - 50.0) for k in range(n_supp)],
        "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    ).write.parquet(str(tmp_path / "supplier.parquet"))
    spark.createDataFrame(
        [(0, "NATION_3", 3), (1, "NATION_7", 3)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).write.parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        [(3, "EUROPE")], "r_regionkey int, r_name string"
    ).write.parquet(str(tmp_path / "region.parquet"))


def _expected_partsupp(n_part, n_supp):
    rows = []
    for pk in range(n_part):
        for i in range(PS_PER_PART):
            rows.append(
                (
                    pk,
                    (pk + i * (n_supp // PS_PER_PART) + pk // n_supp) % n_supp,
                    (pk * 7 + i * 13) % 9999 + 1,
                    (pk * 31 + i * 17) % 100000 + 100,
                )
            )
    return sorted(rows)


def test_partsupp_formulas(spark, tmp_path):
    _dims(spark, tmp_path)
    got = sorted(
        (r["ps_partkey"], r["ps_suppkey"], r["ps_availqty"],
         r["ps_cost_cents"])
        for r in partsupp(spark, str(tmp_path)).collect()
    )
    assert got == _expected_partsupp(6, 4)
    # 4 entries per part, every suppkey in range
    assert len(got) == 6 * PS_PER_PART
    assert all(0 <= s < 4 for _, s, _, _ in got)


def test_min_cost_supplier_keeps_all_ties(spark, tmp_path):
    _dims(spark, tmp_path)
    exp = {}
    for pk, sk, _, cents in _expected_partsupp(6, 4):
        # fixture: all parts qualify (SMALL or size 9 not in list ->
        # only odd parts SMALL, even parts size 9... size list has 5)
        exp.setdefault(pk, []).append((cents, sk))
    got = q_min_cost_supplier(spark, str(tmp_path)).collect()
    # every returned row is the min cost for its part
    for r in got:
        costs = [c for c, _ in exp[r["partkey"]]]
        assert r["cost_cents"] == min(costs)
    # parts qualify via SMALL type (odd) or size in Q2_SIZES (even: 9 no,
    # odd: 5 yes) -> odd parts only; all suppliers sit in EUROPE here
    assert {r["partkey"] for r in got} == {pk for pk in range(6) if pk % 2}


def test_value_share_threshold_exact(spark, tmp_path):
    _dims(spark, tmp_path)
    # NATION_7 is nationkey 1 -> suppliers 1 and 3
    ps = _expected_partsupp(6, 4)
    vals = {}
    tot = 0
    for pk, sk, qty, cents in ps:
        if sk in (1, 3):
            vals[pk] = vals.get(pk, 0) + cents * qty
            tot += cents * qty
    exp = sorted(
        ((pk, v) for pk, v in vals.items() if v * 1000 > tot),
        key=lambda t: (-t[1], t[0]),
    )
    got = [
        (r["ps_partkey"], r["value_cents"])
        for r in q_value_share(spark, str(tmp_path)).collect()
    ]
    assert got == exp


def test_parts_supplier_cnt_excludes_complaints(spark, tmp_path):
    _dims(spark, tmp_path)
    # supplier 0 has s_acctbal -50 -> excluded everywhere
    got = q_parts_supplier_cnt(spark, str(tmp_path)).collect()
    for r in got:
        assert 1 <= r["supplier_cnt"] <= 3  # supplier 0 never counted
    # fixture parts: brand Brand#1 excluded, type ECONOMY excluded,
    # size must be in Q16_SIZES (only odd parts, size 5, type SMALL)
    kept_parts = [pk for pk in range(6) if pk % 2 and pk % 3 != 1]
    counted = set()
    for pk in kept_parts:
        for p2, sk, _, _ in _expected_partsupp(6, 4):
            if p2 == pk and sk != 0:
                counted.add((f"Brand#{pk % 3}", "SMALL", 5, sk))
    exp_total = len({(b, t, s) for b, t, s, _ in counted})
    assert len(got) == exp_total


def test_excess_stock_boundary(spark, tmp_path):
    _dims(spark, tmp_path)
    ps = _expected_partsupp(6, 4)
    # craft lineitem so exactly one (part, supp) passes 2*avail > sum:
    # take two partsupp rows of SMALL parts (p_name 'name..' does NOT
    # start with 'small' -> rename part 1 to qualify the prefix)
    import pandas as pd

    part_dir = tmp_path / "part.parquet"
    import shutil

    shutil.rmtree(part_dir)
    spark.createDataFrame(
        [
            (k, "small widget" if k in (1, 3) else f"name{k}",
             f"Brand#{k % 3}", "SMALL" if k % 2 else "ECONOMY",
             5 if k % 2 else 9, 10.0 + k)
            for k in range(6)
        ],
        "p_partkey bigint, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).write.parquet(str(part_dir))
    r1 = next(r for r in ps if r[0] == 1)
    r3 = next(r for r in ps if r[0] == 3)
    rows = []
    # pass: shipped strictly less than 2*availqty
    rows.append((1, r1[0], r1[1], 1, float(2 * r1[2] - 1)))
    # fail: shipped exactly 2*availqty (boundary: NOT excess)
    rows.append((2, r3[0], r3[1], 1, float(2 * r3[2])))
    spark.createDataFrame(
        [
            (ok, pk, sk, ln, qty, 1.0, 0.0, 0.0, "N", "O",
             "1996-06-01 00:00:00")
            for ok, pk, sk, ln, qty in rows
        ],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate string",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus",
        "cast(l_shipdate as timestamp) as l_shipdate",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = [r["s_suppkey"] for r in
           q_excess_stock_suppliers(spark, str(tmp_path)).collect()]
    # only r1's supplier passes, and only if it sits in NATION_3
    # (nationkey 0 -> suppliers 0 and 2)
    exp = [r1[1]] if r1[1] % 2 == 0 else []
    assert got == exp
