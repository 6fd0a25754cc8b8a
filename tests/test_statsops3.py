"""Batch 60: hand-computed fixtures for Kendall tau-a pair counting
and the Benford first-digit audit."""

import datetime
import math

from ocr_to_csv_spark.functions.statsops3 import (
    q_benford_audit,
    q_kendall_tau,
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


def _order(k, cust, price):
    return (k, cust, "O", price, datetime.datetime(1995, 1, 1), "1-URGENT")


def test_kendall_tau_hand_computed(spark, tmp_path):
    custs = [
        (1, "a", 0, 0.0, "BUILDING"),
        (2, "b", 0, 0.0, "BUILDING"),
        (3, "c", 0, 0.0, "BUILDING"),
    ]
    orders = [
        # cust1: x=1 order, y=10000 cents
        _order(1, 1, 100.0),
        # cust2: x=2, y=30000
        _order(2, 2, 100.0),
        _order(3, 2, 200.0),
        # cust3: x=3, y=15000
        _order(4, 3, 50.0),
        _order(5, 3, 50.0),
        _order(6, 3, 50.0),
    ]
    sf = _write(spark, tmp_path, orders, custs)
    row = q_kendall_tau(spark, sf).collect()[0]
    # pairs (1,2) and (1,3) concordant; (2,3) discordant (x up, y down)
    assert (row["n_pairs"], row["concordant"], row["discordant"]) == (3, 2, 1)
    assert row["ties"] == 0
    assert row["tau_a"] == (2 - 1) / 3


def test_kendall_tau_ties(spark, tmp_path):
    custs = [
        (1, "a", 0, 0.0, "AUTO"),
        (2, "b", 0, 0.0, "AUTO"),
    ]
    # same order count, different spend → the single pair is an x-tie
    orders = [_order(1, 1, 100.0), _order(2, 2, 200.0)]
    sf = _write(spark, tmp_path, orders, custs)
    row = q_kendall_tau(spark, sf).collect()[0]
    assert (row["n_pairs"], row["ties"]) == (1, 1)
    assert (row["concordant"], row["discordant"]) == (0, 0)
    assert row["tau_a"] == 0.0


def test_benford_digits_and_dev(spark, tmp_path):
    custs = [(1, "a", 0, 0.0, "AUTO")]
    orders = [
        _order(1, 1, 123.45),  # digit 1
        _order(2, 1, 19.99),  # digit 1
        _order(3, 1, 234.5),  # digit 2
        _order(4, 1, 345.0),  # digit 3
        _order(5, 1, 999.99),  # digit 9
        _order(6, 1, 0.5),  # < 1.0 → excluded
    ]
    sf = _write(spark, tmp_path, orders, custs)
    rows = {r["digit"]: r for r in q_benford_audit(spark, sf).collect()}
    assert {d: rows[d]["obs"] for d in rows} == {1: 2, 2: 1, 3: 1, 9: 1}
    assert all(r["n_total"] == 5 for r in rows.values())
    p1 = math.log10(2.0)
    assert rows[1]["expected_p"] == p1
    exp = 5 * p1
    assert abs(rows[1]["dev"] - (2 - exp) ** 2 / exp) < 1e-12


def _luhn_valid(acct: str) -> bool:
    total = 0
    for pos, ch in enumerate(reversed(acct)):
        v = int(ch)
        if pos % 2 == 1:  # every 2nd from the right (check digit is pos 0)
            v = v * 2
            if v > 9:
                v -= 9
        total += v
    return total % 10 == 0


def test_luhn_audit_planted_corruption(spark, tmp_path):
    from ocr_to_csv_spark.functions.statsops3 import (
        LUHN_BAD_MOD,
        _luhn_check_digit,
        q_luhn_audit,
    )

    custs = [(k, f"c{k}", 0, 0.0, "SEG") for k in range(1, 30)]
    spark.createDataFrame(custs, CUST_SCHEMA).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    row = q_luhn_audit(spark, str(tmp_path)).collect()[0]
    n_bad = sum(1 for k in range(1, 30) if k % LUHN_BAD_MOD == 0)
    assert (row["n"], row["n_invalid"], row["n_valid"]) == (
        29, n_bad, 29 - n_bad,
    )
    # the synthesis rule itself is textbook Luhn: check one account
    body = str((5 * 73 + 11) % 10_000_000_000).zfill(10)
    acct = body + str(_luhn_check_digit(body))
    assert _luhn_valid(acct)
    # and an off-by-one check digit must fail validation
    bad = body + str((_luhn_check_digit(body) + 1) % 10)
    assert not _luhn_valid(bad)
