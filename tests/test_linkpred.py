"""Batch 17: hand-computed fixtures for common-neighbor link scoring
(incl. existing-edge exclusion and integer RA score), INTERSECT/EXCEPT
tags, the decorrelated above-average subquery, and curriculum
interleaving."""

from pyspark.sql import functions as F

from ocr_to_csv_spark.functions.linkpred import (
    RA_SCALE,
    q_above_avg_subquery,
    q_common_neighbors,
    q_curriculum_order,
    q_set_ops,
)


def _docs(spark, tmp_path, n):
    rows = [(i, f"doc {i}", "en", f"s{i % 2}", 10 + i) for i in range(n)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_common_neighbors_excludes_edges_and_scores(spark, tmp_path):
    # n=4 gives a tiny deterministic modular graph; recompute expected
    # edges in python and verify the top pair by brute force
    n = 6
    sf = _docs(spark, tmp_path, n)
    edges = set()
    for i in range(n):
        if i % 3 != 0:
            edges.add((i, (i * 2 + 1) % n))
        if i % 2 == 0:
            edges.add((i, (i * 7 + 3) % n))
        if i % 6 == 1:
            edges.add((i, (i + n // 2) % n))
    ue = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {}
    for a, b in ue:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {z: len(v) for z, v in adj.items()}
    exp = {}
    nodes = sorted(adj)
    for ia, a in enumerate(nodes):
        for b in nodes[ia + 1:]:
            common = adj[a] & adj[b]
            if common and (a, b) not in ue:
                exp[(a, b)] = (
                    len(common),
                    sum(RA_SCALE // deg[z] for z in common),
                )
    got = {
        (r["a"], r["b"]): (r["cn"], r["ra"])
        for r in q_common_neighbors(spark, sf).collect()
    }
    assert got == exp  # < TOP_PAIRS candidates at n=6, so full equality


def test_set_ops_tags(spark, tmp_path):
    spark.createDataFrame(
        [(1, 10, "O", 1.0), (2, 20, "O", 1.0), (3, 30, "F", 1.0)],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double",
    ).withColumn("o_orderdate", F.lit(None).cast("timestamp")).withColumn(
        "o_orderpriority", F.lit("1-URGENT")
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(10, -5.0), (40, -1.0), (20, 3.0)],
        "c_custkey bigint, c_acctbal double",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    got = {
        (r["custkey"], r["op"]) for r in q_set_ops(spark, str(tmp_path)).collect()
    }
    # open customers {10,20}; negative-balance {10,40}
    assert got == {(10, "both"), (20, "open_only")}


def test_above_avg_strict_integer_comparison(spark, tmp_path):
    # cust 1: orders 1.00, 3.00 → avg 2.00; only the 3.00 qualifies.
    # cust 2: both equal → none qualify (strict).
    rows = [
        (1, 1, "O", 1.00),
        (2, 1, "O", 3.00),
        (3, 2, "O", 2.00),
        (4, 2, "O", 2.00),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    got = [
        (r["o_orderkey"], r["cents"])
        for r in q_above_avg_subquery(spark, str(tmp_path)).collect()
    ]
    assert got == [(2, 300)]


def test_curriculum_interleaves_sources(spark, tmp_path):
    # two sources, longest-first within source, round-robin across
    rows = [
        (0, "a", "en", "s0", 100),
        (1, "b", "en", "s0", 50),
        (2, "c", "en", "s1", 80),
        (3, "d", "en", "s1", 90),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = [
        (r["seq"], r["doc_id"])
        for r in sorted(
            q_curriculum_order(spark, str(tmp_path)).collect(),
            key=lambda r: r["seq"],
        )
    ]
    # rn=1: s0→doc0 (100), s1→doc3 (90); rn=2: s0→doc1, s1→doc2
    assert got == [(1, 0), (2, 3), (3, 1), (4, 2)]


def test_curriculum_order_no_single_partition_window(spark):
    # scale guard: the global seq must come from partition-offset ranks,
    # never a single-partition window (Exchange SinglePartition -> Window)
    df = q_curriculum_order(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    # and it must still be an exact global row_number: seq is a
    # permutation of 1..n matching the lexicographic (rn, source, doc_id)
    rows = df.collect()
    n = len(rows)
    assert sorted(r["seq"] for r in rows) == list(range(1, n + 1))
    by_key = sorted(rows, key=lambda r: (r["rn"], r["source"], r["doc_id"]))
    assert [r["seq"] for r in by_key] == list(range(1, n + 1))
