"""Batch 14: hand-computed fixtures for RFM segmentation, the
trailing-28-day DAU/MAU window, HLL merge-equality, degree-dist binning,
and per-doc tf-idf keyword ranking."""

import datetime

from ocr_to_csv_spark.functions.engagement import q_dau_mau, q_rfm

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


def test_rfm_segments_and_exact_cents(spark, tmp_path):
    base = TS(2024, 1, 31, 12, 0, 0)
    rows = [
        # user 1: last day = corpus max day, 2 events, 0.01+0.02 = 0.03
        (1, base, 1, "buy", 0.01, "{}"),
        (2, base - datetime.timedelta(days=40), 1, "buy", 0.02, "{}"),
        # user 2: last seen 5 days before max -> R2
        (3, base - datetime.timedelta(days=5), 2, "view", 5000.0, "{}"),
        # null user dropped
        (4, base, None, "ghost", 9.99, "{}"),
    ]
    d = _events(spark, tmp_path, rows)
    got = {r["user_id"]: r for r in q_rfm(spark, d).collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert r1["recency_days"] == 0
    assert r1["frequency"] == 2
    assert r1["monetary"] == 0.03  # exact: 1 + 2 cents
    assert r1["segment"] == "R1-F3-M3"
    r2 = got[2]
    assert r2["recency_days"] == 5
    assert r2["segment"] == "R2-F3-M1"  # 500000 cents >= M_HIGH


def test_dau_mau_trailing_window(spark, tmp_path):
    d0 = TS(2024, 3, 1)
    rows = [
        # day 0: users 1, 2
        (1, d0, 1, "a", 0.0, "{}"),
        (2, d0, 2, "a", 0.0, "{}"),
        (3, d0, 1, "a", 0.0, "{}"),  # same user same day -> still 1 DAU
        # day 10: user 3
        (4, d0 + datetime.timedelta(days=10), 3, "a", 0.0, "{}"),
        # day 40: user 1 (outside 28d of day 0 and day 10)
        (5, d0 + datetime.timedelta(days=40), 1, "a", 0.0, "{}"),
    ]
    d = _events(spark, tmp_path, rows)
    got = {r["target_day"].date(): r for r in q_dau_mau(spark, d).collect()}
    assert set(got) == {
        datetime.date(2024, 3, 1),
        datetime.date(2024, 3, 11),
        datetime.date(2024, 4, 10),
    }
    g0 = got[datetime.date(2024, 3, 1)]
    assert (g0["dau"], g0["mau"]) == (2, 2)
    g10 = got[datetime.date(2024, 3, 11)]
    # trailing 28 days of day 10 includes day 0 -> users {1,2,3}
    assert (g10["dau"], g10["mau"]) == (1, 3)
    assert g10["stickiness"] == 1.0 / 3.0
    g40 = got[datetime.date(2024, 4, 10)]
    # day 40 - 27 = day 13 > day 10 -> only user 1
    assert (g40["dau"], g40["mau"]) == (1, 1)


def test_hll_merge_registers_identical(spark):
    from ocr_to_csv_spark.functions.relational import q_hll_merge

    rows = q_hll_merge(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["n_reg_diff"] == 0  # half-merge == whole-pass registers
        assert r["est_merged"] == r["est_whole"]


def test_degree_dist_bins_cover_all_nodes_with_edges(spark):
    from ocr_to_csv_spark.functions.graphtext import _edges, q_degree_dist
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    out = q_degree_dist(spark, sf).collect()
    assert out
    # bins are disjoint powers of two: min/max of each bin must sit in
    # [2^(b-1), 2^b)
    n_nodes_total = 0
    for r in out:
        lo, hi = 1 << (r["log2_bin"] - 1), 1 << r["log2_bin"]
        assert lo <= r["min_deg"] <= r["max_deg"] < hi
        n_nodes_total += r["n_nodes"]
    d = spark.read.parquet(f"{sf}/documents.parquet")
    n = d.count()
    nodes = d.select(F.col("doc_id").cast("long").alias("id"))
    expect = (
        _edges(nodes, n)
        .select(F.explode(F.array("src", "dst")).alias("id"))
        .select("id")
        .distinct()
        .count()
    )
    assert n_nodes_total == expect


def test_doc_tfidf_keywords_rank_and_integer_score(spark, tmp_path):
    from ocr_to_csv_spark.functions.textmetrics import q_doc_tfidf_keywords

    docs = [
        (0, "alpha alpha beta unique0", "en", "s", 10),
        (1, "alpha beta beta unique1", "en", "s", 10),
        (2, "alpha gamma", "en", "s", 8),
    ]
    spark.createDataFrame(
        docs,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = [
        r
        for r in q_doc_tfidf_keywords(spark, str(tmp_path)).collect()
        if r["doc_id"] == 0
    ]
    by_rank = {r["rank"]: r for r in out}
    # N=3. idf6: alpha df=3 -> 1_000_000; beta df=2 -> 1_500_000;
    # unique0 df=1 -> 3_000_000.
    # scores doc0: alpha tf2 -> 2_000_000; beta tf1 -> 1_500_000;
    # unique0 tf1 -> 3_000_000. Order: unique0, alpha, beta.
    assert [by_rank[i]["keyword"] for i in (1, 2, 3)] == [
        "unique0", "alpha", "beta",
    ]
    assert by_rank[1]["score"] == 3_000_000
    assert by_rank[2]["score"] == 2_000_000
    assert by_rank[3]["score"] == 1_500_000
