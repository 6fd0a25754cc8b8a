"""Batch 28: hand-computed fixtures — linear interpolation across gaps
(including endpoint carry) and checksum-diff statuses."""

import datetime

from pyspark.sql import functions as F

from ocr_to_csv_spark.functions.dataops import TD_DROP, TD_MUT, q_table_diff
from ocr_to_csv_spark.functions.temporal import GAP_SCALE, q_gap_fill

TS = datetime.datetime


def test_gap_fill_linear_interpolation(spark, tmp_path):
    # user 1: day 0 val 10.00, day 3 val 40.00 -> days 1,2 interpolate
    rows = [
        (1, TS(1995, 1, 1), 1, "click", 10.0, "{}"),
        (2, TS(1995, 1, 4), 1, "click", 40.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {r["day"]: (r["val_milli"], r["was_gap"])
           for r in q_gap_fill(spark, str(tmp_path)).collect()}
    S = GAP_SCALE
    assert got[0] == (1000 * S, 0)       # 10.00 in cents*milli
    assert got[3] == (4000 * S, 0)
    assert got[1] == (1000 * S + (3000 * S * 1) // 3, 1)  # 20.00
    assert got[2] == (1000 * S + (3000 * S * 2) // 3, 1)  # 30.00


def test_table_diff_statuses(spark, tmp_path):
    # doc_ids chosen to hit each residue class exactly once
    changed = TD_MUT + 3      # % 97 == 3 -> text perturbed in replica
    missing = TD_DROP + 7     # % 101 == 7 -> dropped from replica
    clean = 5
    docs = [
        (clean, "same text", "en", "s1", 9),
        (changed, "will change", "en", "s1", 11),
        (missing, "will vanish", "en", "s1", 11),
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r["status"] for r in q_table_diff(spark, str(tmp_path)).collect()}
    assert got == {changed: "changed", missing: "missing_in_replica"}


def test_ab_test_statistic_hand_computed(spark, tmp_path):
    import hashlib
    import math

    from ocr_to_csv_spark.functions.analytics2 import q_ab_test

    def arm(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2

    users0 = [u for u in range(40) if arm(u) == 0][:3]
    users1 = [u for u in range(40) if arm(u) == 1][:3]
    vals0 = [10.0, 20.0, 30.0]
    vals1 = [20.0, 30.0, 40.0]
    rows = []
    eid = 0
    for u, v in list(zip(users0, vals0)) + list(zip(users1, vals1)):
        rows.append((eid, TS(2001, 1, 1), u, "purchase", v, "{}")); eid += 1
        rows.append((eid, TS(2001, 1, 1), u, "click", 999.0, "{}")); eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    r = q_ab_test(spark, str(tmp_path)).collect()[0]
    assert (r["n0"], r["n1"]) == (3, 3)
    assert r["mean0"] == 2000.0 and r["mean1"] == 3000.0  # cents
    # var = 1e6 cents^2 for both arms; se = sqrt(2e6/3)
    assert abs(r["z"] - 1000.0 / math.sqrt(2_000_000.0 / 3)) < 1e-9


def test_item_cf_cosine_fixed_point(spark, tmp_path):
    from ocr_to_csv_spark.functions.analytics2 import ITEM_CF_SCALE, q_item_cf

    li = []
    # parts 1,2 co-occur in orders 1,2; part 3 only in order 1
    for ok, parts in [(1, [1, 2, 3]), (2, [1, 2]), (3, [1])]:
        for p in parts:
            li.append((ok, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", TS(2001, 1, 1)))
    spark.createDataFrame(
        li,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber bigint,"
        " l_quantity double, l_extendedprice double, l_discount double, l_tax double,"
        " l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = {(r["pa"], r["pb"]): r for r in q_item_cf(spark, str(tmp_path)).collect()}
    assert set(got) == {(1, 2)}  # only pair with cooc >= 2
    r = got[(1, 2)]
    assert (r["cooc"], r["na"], r["nb"]) == (2, 3, 2)
    assert r["cos2_fp"] == (4 * ITEM_CF_SCALE) // 6


def test_er_golden_transitive_cluster(spark, tmp_path):
    """Docs linked a-b and b-c (never a-c directly, they sit in
    different length buckets via b's doubled block membership... here
    simply identical docs) must land in ONE cluster with min id
    golden."""
    import hashlib

    from ocr_to_csv_spark.functions.analytics2 import FS_PREFIX
    from ocr_to_csv_spark.functions.composed import q_er_golden

    def half(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 2

    evens = [i for i in range(60) if half(i) == 0]
    odds = [i for i in range(60) if half(i) == 1]
    base = "link me " + "x " * 30
    docs = [
        (evens[0], base, "en", "s1", len(base)),
        (odds[0], base, "en", "s1", len(base)),
        (evens[1], base, "en", "s1", len(base)),
        (odds[1], base, "en", "s1", len(base)),
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: (r["cluster_id"], r["is_golden"])
           for r in q_er_golden(spark, str(tmp_path)).collect()}
    ids = sorted(got)
    root = min(ids)
    assert all(c == root for c, _ in got.values())
    assert [v[1] for _, v in sorted(got.items())] == [
        1 if i == root else 0 for i in ids
    ]


def test_k_anon_flags_small_classes(spark, tmp_path):
    from ocr_to_csv_spark.functions.dataops import K_ANON, q_k_anon_audit

    rows = [(i, f"Customer#{i:09d}", 1, 5.00, "B") for i in range(K_ANON)]  # safe
    rows += [(100 + j, f"Customer#{100+j:09d}", 2, 5.00, "B") for j in range(K_ANON - 1)]
    spark.createDataFrame(
        rows, "c_custkey bigint, c_name string, c_nationkey bigint,"
        " c_acctbal double, c_mktsegment string"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    got = q_k_anon_audit(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert (got[0]["nation"], got[0]["class_size"]) == (2, K_ANON - 1)


def test_theil_sen_robust_to_outlier_day(spark, tmp_path):
    from ocr_to_csv_spark.functions.statsops import q_theil_sen

    # days 0,1,2,3 with values 100,200,300,99900 (cents: x100):
    # OLS would be wrecked; pairwise slopes median stays near 100/day
    rows = []
    eid = 0
    for d, v in [(1, 1.00), (2, 2.00), (3, 3.00), (4, 999.00)]:
        rows.append((eid, TS(2024, 1, d), 1, "click", v, "{}")); eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    r = q_theil_sen(spark, str(tmp_path)).collect()[0]
    assert r["n_pairs"] == 6
    # sorted slopes (cents/day): 100,100,100, 49850, 49900, 99600 -> median rank 3
    assert (r["dy"], r["dx"]) in {(100, 1), (200, 2), (300, 3)}
    assert r["slope"] == 100.0


def test_ndcg_perfect_and_bounds(spark):
    from ocr_to_csv_spark.functions.textmetrics import q_ndcg

    rows = q_ndcg(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0.0 < r["ndcg"] <= 1.0
        assert r["idcg"] >= r["dcg"] > 0.0
        assert 1 <= r["depth"] <= 10
