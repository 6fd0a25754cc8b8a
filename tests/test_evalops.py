"""Batch 65: hand-computed fixtures for the confusion matrix and the
gains/lift table."""

import datetime

from ocr_to_csv_spark.functions.evalops import (
    q_gains_table,
    q_lang_confusion,
)

DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)
CUST_SCHEMA = (
    "c_custkey bigint, c_name string, c_nationkey bigint, "
    "c_acctbal double, c_mktsegment string"
)
ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def test_lang_confusion_hand_computed(spark, tmp_path):
    docs = [
        (1, "the cat is on the mat", "en", "web", 21),  # en → en
        (2, "der hund und die katze", "de", "web", 22),  # de → de
        (3, "xyzzy qwerty", "en", "web", 12),  # en → und
        (4, "the quick brown fox", "de", "web", 19),  # de → en (mislabel)
    ]
    spark.createDataFrame(docs, DOCS_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {
        (r["lang"], r["lang_pred"]): r
        for r in q_lang_confusion(spark, str(tmp_path)).collect()
    }
    assert {k: rows[k]["n"] for k in rows} == {
        ("en", "en"): 1,
        ("en", "und"): 1,
        ("de", "de"): 1,
        ("de", "en"): 1,
    }
    diag = rows[("en", "en")]
    assert diag["is_diag"] == 1
    assert diag["true_tot"] == 2 and diag["pred_tot"] == 2
    assert diag["row_share"] == 0.5  # recall of en
    assert diag["col_share"] == 0.5  # precision of en predictions


def test_gains_table_hand_computed(spark, tmp_path):
    # 10 customers, balances 1000..100; positives are the top-2 scorers
    custs = [
        (k, f"c{k}", 0, float(1100 - 100 * k), "AUTO") for k in range(1, 11)
    ]
    ts = datetime.datetime(1995, 1, 1)
    orders = [
        (1, 1, "O", 10.0, ts, "1-URGENT"),
        (2, 2, "O", 10.0, ts, "1-URGENT"),
        (3, 2, "O", 10.0, ts, "1-URGENT"),  # same customer twice
        (4, 9, "O", 10.0, ts, "5-LOW"),
    ]
    spark.createDataFrame(custs, CUST_SCHEMA).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    spark.createDataFrame(orders, ORDERS_SCHEMA).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    rows = {r["decile"]: r for r in q_gains_table(spark, str(tmp_path)).collect()}
    assert len(rows) == 10 and all(rows[d]["n"] == 1 for d in rows)
    # deciles 1 and 2 hold the two positives (highest balances)
    assert rows[1]["pos"] == 1 and rows[2]["pos"] == 1
    assert all(rows[d]["pos"] == 0 for d in range(3, 11))
    assert rows[2]["cum_pos"] == 2 and rows[2]["capture"] == 1.0
    assert rows[1]["capture"] == 0.5
    # lift of a pure-positive decile = total_n/total_pos = 10/2
    assert rows[1]["lift"] == 5.0
    assert rows[5]["lift"] == 0.0
