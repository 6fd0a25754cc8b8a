"""Batch 18: hand-computed fixtures for the exact-median rank pick
(odd/even group sizes), navigation window functions, regex extraction
counts, and array set-algebra sizes with duplicates."""

import datetime

from ocr_to_csv_spark.functions.sqlsurface import (
    q_array_surface,
    q_median_exact,
    q_nav_window,
    q_regex_words,
)

TS = datetime.datetime

EV_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)


def test_median_exact_odd_and_even(spark, tmp_path):
    rows = [
        # odd group: 1,2,9 → median 2 → med2 = 4
        (1, TS(2024, 1, 1), 1, "odd", 0.01, "{}"),
        (2, TS(2024, 1, 1), 1, "odd", 0.02, "{}"),
        (3, TS(2024, 1, 1), 1, "odd", 0.09, "{}"),
        # even group: 1,2,4,9 → median (2+4)/2 → med2 = 6
        (4, TS(2024, 1, 1), 1, "even", 0.01, "{}"),
        (5, TS(2024, 1, 1), 1, "even", 0.02, "{}"),
        (6, TS(2024, 1, 1), 1, "even", 0.04, "{}"),
        (7, TS(2024, 1, 1), 1, "even", 0.09, "{}"),
    ]
    spark.createDataFrame(rows, EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r["event_type"]: (r["n"], r["med2"])
        for r in q_median_exact(spark, str(tmp_path)).collect()
    }
    assert got == {"odd": (3, 4), "even": (4, 6)}


def test_nav_window_first_last_second(spark, tmp_path):
    rows = [
        (1, 1, "O", 1.00, TS(2024, 1, 1), "1"),
        (2, 1, "O", 2.00, TS(2024, 1, 2), "1"),
        (3, 1, "O", 3.00, TS(2024, 1, 3), "1"),
        (4, 2, "O", 5.00, TS(2024, 1, 1), "1"),  # single order
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    got = {
        r["o_custkey"]: (r["first_c"], r["last_c"], r["second_c"], r["n_orders"])
        for r in q_nav_window(spark, str(tmp_path)).collect()
    }
    assert got[1] == (100, 300, 200, 3)
    assert got[2] == (500, 500, None, 1)


def _docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_regex_words_counts(spark, tmp_path):
    sf = _docs(
        spark,
        tmp_path,
        [
            (0, "spark sort the sort stream so sky", "en", "s", 1),
            (1, "no matches here", "en", "s", 1),
        ],
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["n_distinct"])
        for r in q_regex_words(spark, sf).collect()
    }
    # s-words of 4+ letters: spark, sort, sort, stream ("so"/"sky" too short)
    assert got[0] == (4, 3)
    assert got[1] == (0, 0)


def test_array_surface_set_sizes(spark, tmp_path):
    # tokens: [a b a c] [c d d e] → first ∩ second sets: {} vs halves:
    # first half = [a b a c][:2] = [a b]; second = [a c]... build explicit
    sf = _docs(spark, tmp_path, [(0, "a b a c", "en", "s", 1)])
    r = q_array_surface(spark, sf).collect()[0]
    # first = [a, b], second = [a, c]: common {a}=1, union {a,b,c}=3,
    # only-first {b}=1
    assert (r["n_common"], r["n_union"], r["n_only_first"]) == (1, 3, 1)
