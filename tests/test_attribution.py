"""Batch 21: hand-computed fixtures for last-touch attribution
(direct fallback, strictly-earlier frame), time-to-convert latency
(purchase-before-signup excluded), and market-basket pair counts."""

import datetime

from ocr_to_csv_spark.functions.attribution import (
    q_basket_pairs,
    q_last_touch,
    q_time_to_convert,
)

TS = datetime.datetime

EV_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)


def _events(spark, tmp_path, rows):
    spark.createDataFrame(rows, EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def at(s):
    return TS(2024, 1, 1, 0, 0, 0) + datetime.timedelta(seconds=s)


def test_last_touch_channels(spark, tmp_path):
    rows = [
        # user 1: click @0, purchase @10 (click, age 10),
        # view @20, purchase @30 (view, age 10),
        # purchase @40 (view again — prior purchases don't attribute)
        (1, at(0), 1, "click", 1.0, "{}"),
        (2, at(10), 1, "purchase", 1.0, "{}"),
        (3, at(20), 1, "view", 1.0, "{}"),
        (4, at(30), 1, "purchase", 1.0, "{}"),
        (5, at(40), 1, "purchase", 1.0, "{}"),
        # user 2: purchase with no prior events → direct
        (6, at(5), 2, "purchase", 1.0, "{}"),
    ]
    sf = _events(spark, tmp_path, rows)
    got = {
        r["event_id"]: (r["channel"], r["age_s"])
        for r in q_last_touch(spark, sf).collect()
    }
    assert got == {
        2: ("click", 10),
        4: ("view", 10),
        5: ("view", 20),
        6: ("direct", -1),
    }


def test_time_to_convert_excludes_pre_signup_purchases(spark, tmp_path):
    rows = [
        # user 1: purchase @5 BEFORE signup @10 ignored; next @25 counts
        (1, at(5), 1, "purchase", 1.0, "{}"),
        (2, at(10), 1, "signup", 1.0, "{}"),
        (3, at(25), 1, "purchase", 1.0, "{}"),
        # user 2: signup, never purchases → excluded
        (4, at(0), 2, "signup", 1.0, "{}"),
        # user 3: purchases but never signs up → excluded
        (5, at(0), 3, "purchase", 1.0, "{}"),
    ]
    sf = _events(spark, tmp_path, rows)
    got = {
        r["user_id"]: (r["signup_sec"] is not None, r["latency_s"])
        for r in q_time_to_convert(spark, sf).collect()
    }
    assert got == {1: (True, 15)}


def test_basket_pairs_counts(spark, tmp_path):
    rows = [
        # order 1: parts 1,2,3 → pairs (1,2),(1,3),(2,3)
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", at(0)),
        (1, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", at(0)),
        (1, 3, 1, 3, 1.0, 1.0, 0.0, 0.0, "N", "O", at(0)),
        # order 2: parts 1,2 (part 2 twice — distinct collapses)
        (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", at(0)),
        (2, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", at(0)),
        (2, 2, 1, 3, 1.0, 1.0, 0.0, 0.0, "N", "O", at(0)),
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber bigint, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = [
        (r["part_a"], r["part_b"], r["n_orders"])
        for r in q_basket_pairs(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 2, 2), (1, 3, 1), (2, 3, 1)]
