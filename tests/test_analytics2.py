"""Batch 24: hand-computed fixtures — KMV sketch exactness in the
small-cardinality regime, Fellegi–Sunter blocking/score invariants, and
the covariance-cell formula."""

import hashlib

from pyspark.sql import functions as F

from ocr_to_csv_spark.functions.analytics2 import (
    FS_CHAR_BUCKET,
    FS_THRESHOLD,
    FS_WEIGHTS,
    PCA_SCALE,
    q_pca_cov,
    q_record_linkage,
    q_theta_intersect,
)


def _hex32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_theta_sketch_exact_when_under_k(spark, tmp_path):
    # 6 users across two types; |A∩B| = 2 (users 3, 4)
    rows = []
    eid = 0
    for u in (1, 2, 3, 4):
        rows.append((eid, "2001-01-01 00:00:00", u, "alpha", 1.0, "{}")); eid += 1
    for u in (3, 4, 5, 6):
        rows.append((eid, "2001-01-01 00:00:00", u, "beta", 1.0, "{}")); eid += 1
        # duplicate event for the same (type, user): must not change sketches
        rows.append((eid, "2001-01-02 00:00:00", u, "beta", 2.0, "{}")); eid += 1
    spark.createDataFrame(
        [(i, t, u, k, v, p) for (i, t, u, k, v, p) in rows],
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        str(tmp_path / "events.parquet")
    )
    got = q_theta_intersect(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["type_a"], r["type_b"]) == ("alpha", "beta")
    # under K the union sketch holds every member: counts are exact
    assert r["k_used"] == 6  # |A ∪ B|
    assert r["n_both"] == 2  # |A ∩ B|
    assert r["exact_inter"] == 2
    assert r["h_k"] == max(
        _hex32(str(u)) for u in (1, 2, 3, 4, 5, 6)
    )


def _doc(doc_id, text, lang="en", source="s1"):
    return (doc_id, text, lang, source, len(text))


def test_record_linkage_blocks_and_scores(spark, tmp_path):
    # find doc_ids on each hash-parity half
    evens = [i for i in range(40) if _hex32(str(i)) % 2 == 0]
    odds = [i for i in range(40) if _hex32(str(i)) % 2 == 1]
    a, b, c = evens[0], odds[0], odds[1]
    base = "match me exactly " + "x " * 20  # same prefix/tokens/length
    far = "zz " * 200  # different length bucket from base
    docs = [
        _doc(a, base),             # left half
        _doc(b, base),             # right half, perfect agreement → link
        _doc(c, far),              # right half, different block → no pair
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = q_record_linkage(spark, str(tmp_path)).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in got] == [(a, b)]
    r = got[0]
    full = sum(FS_WEIGHTS[f][0] for f in FS_WEIGHTS)
    assert r["score"] == full > FS_THRESHOLD
    assert (r["agr_source"], r["agr_tokens"], r["agr_prefix"]) == (1, 1, 1)
    assert len(base) // FS_CHAR_BUCKET != len(far) // FS_CHAR_BUCKET


def test_pca_cov_formula(spark, tmp_path):
    # 3 vectors in 2-d with integral quantized values
    vecs = [
        (1, [1.0, 2.0], 0),
        (2, [3.0, 5.0], 0),
        (3, [5.0, 11.0], 0),
    ]
    spark.createDataFrame(
        vecs, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    got = {(r["i"], r["j"]): r for r in q_pca_cov(spark, str(tmp_path)).collect()}
    S = PCA_SCALE
    xs = [1 * S, 3 * S, 5 * S]
    ys = [2 * S, 5 * S, 11 * S]
    n = 3
    def cov_num(u, v):
        return n * sum(a * b for a, b in zip(u, v)) - sum(u) * sum(v)
    assert got[(0, 0)]["cov_num"] == cov_num(xs, xs)
    assert got[(0, 1)]["cov_num"] == cov_num(xs, ys)
    assert got[(1, 1)]["cov_num"] == cov_num(ys, ys)
    assert all(r["n"] == 3 for r in got.values())
    assert set(got) == {(0, 0), (0, 1), (1, 1)}


def test_join_card_est_exact_when_no_collisions(spark, tmp_path):
    from ocr_to_csv_spark.functions.analytics2 import q_join_card_est

    # single shared key value: bucket histograms are collision-free, so
    # the estimate equals the exact product
    li = [(1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "2001-01-01")] * 3
    spark.createDataFrame(
        [(a, b, c, d, e, f, g, h, i, j, k) for a, b, c, d, e, f, g, h, i, j, k in li],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber bigint,"
        " l_quantity double, l_extendedprice double, l_discount double, l_tax double,"
        " l_returnflag string, l_linestatus string, l_shipdate string",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, 1, "O", 1.0, "2001-01-01", "1-URGENT")] * 2,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    r = q_join_card_est(spark, str(tmp_path)).collect()[0]
    assert r["exact_join_rows"] == 6
    assert r["est_join_rows"] == 6
    assert r["upper_bound_holds"] == 1


def test_topk_agg_matches_window_semantics(spark):
    from ocr_to_csv_spark.functions.analytics2 import TOPK_AGG_K, q_topk_agg

    sf = "/root/testdata/sf0.001"
    rows = q_topk_agg(spark, sf).collect()
    per = {}
    for r in rows:
        per.setdefault(r["custkey"], []).append((r["rnk"], r["price_cents"]))
    for cust, lst in per.items():
        lst.sort()
        assert len(lst) <= TOPK_AGG_K
        prices = [p for _, p in lst]
        assert prices == sorted(prices, reverse=True)


def test_bitmap_sets_equals_exact_intersections(spark):
    from ocr_to_csv_spark.functions.analytics2 import (
        q_bitmap_sets,
        q_theta_intersect,
    )

    sf = "/root/testdata/sf0.001"
    bm = {(r["type_a"], r["type_b"]): r["n_inter"]
          for r in q_bitmap_sets(spark, sf).collect()}
    exact = {(r["type_a"], r["type_b"]): r["exact_inter"]
             for r in q_theta_intersect(spark, sf).collect()}
    assert bm == exact  # bitmaps are exact, the sketch's audit agrees
