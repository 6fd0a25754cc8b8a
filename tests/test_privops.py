"""Batch 59: k-anonymity generalization picks the MINIMAL sufficient
level (hand-crafted lattice), and quantile normalization forces every
source onto the pooled distribution."""

from ocr_to_csv_spark.functions.privops import (
    K_ANON,
    q_k_anon_generalize,
    q_quantile_norm,
)

CUST_SCHEMA = (
    "c_custkey bigint, c_name string, c_nationkey bigint, "
    "c_acctbal double, c_mktsegment string"
)
DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def test_k_anon_minimal_level(spark, tmp_path):
    # nation 0: 5 customers at $0-100 (level-0 bucket 0) → k=5 OK at L0
    # nation 1: 4 at bucket 0 + 1 at bucket 1 → L0 has a group of 1;
    # at L1 ($200 buckets) nation-1 collapses into one group of 5
    rows = [(i, f"a{i}", 0, 50.0, "S") for i in range(5)]
    rows += [(10 + i, f"b{i}", 1, 50.0, "S") for i in range(4)]
    rows += [(20, "b4", 1, 150.0, "S")]
    spark.createDataFrame(rows, CUST_SCHEMA).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    got = q_k_anon_generalize(spark, str(tmp_path)).collect()
    assert all(r["lvl"] == 1 for r in got)
    groups = {(r["c_nationkey"], r["bucket"]): r["n"] for r in got}
    assert groups == {(0, 0): 5, (1, 0): 5}
    assert all(n >= K_ANON for n in groups.values())


def test_quantile_norm_equalizes_sources(spark, tmp_path):
    # two sources with different scales; after normalization the
    # rank-r value is the pooled mean of both sources' rank-r values
    rows = [(i, "t", "en", "a", 10 * (i + 1)) for i in range(3)]       # 10,20,30
    rows += [(10 + i, "t", "en", "b", 1000 * (i + 1)) for i in range(3)]
    spark.createDataFrame(rows, DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = q_quantile_norm(spark, str(tmp_path)).collect()
    by_rank = {}
    for r in got:
        by_rank.setdefault(r["r"], []).append(r)
    for rank, rs in by_rank.items():
        assert len(rs) == 2  # both sources contribute each rank
        assert all(x["pool_cnt"] == 2 for x in rs)
        assert rs[0]["pool_sum"] == 10 * rank + 1000 * rank
        # normalized value identical across sources at equal rank
        assert len({(x["pool_sum"], x["pool_cnt"]) for x in rs}) == 1
