"""Batch 54: hand-computed DAG longest-path levels (multi-parent max,
not tree depth) and a functional-dependency audit over crafted
holding/violated dependencies."""

from ocr_to_csv_spark.functions.dagops import q_dag_levels, q_fd_audit

CUST_SCHEMA = (
    "c_custkey bigint, c_name string, c_nationkey bigint, "
    "c_acctbal double, c_mktsegment string"
)


def _dag_level(k, n):
    # python mirror: level = 1 + max(level of parents), roots 0/1 at 0
    memo = {}

    def lvl(x):
        if x < 2:
            return 0
        if x not in memo:
            pars = {x // 2} | ({x // 3} if x >= 3 else set())
            memo[x] = 1 + max(lvl(p) for p in pars)
        return memo[x]

    return lvl(k)


def test_dag_levels_hand_computed(spark, tmp_path):
    n = 30
    rows = [(k, f"c{k}", 0, 0.0, "S") for k in range(n)]
    spark.createDataFrame(rows, CUST_SCHEMA).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    got = {
        r["node"]: r["lvl"]
        for r in q_dag_levels(spark, str(tmp_path)).collect()
    }
    assert got == {k: _dag_level(k, n) for k in range(n)}
    # multi-parent matters: node 9's parents are 4 (lvl 2) and 3
    # (lvl 1) → longest path gives 3, tree-depth-via-div2 would give 3
    # too, but node 6 (parents 3 lvl 1, 2 lvl 1) = 2 while 12 (parents
    # 6 lvl 2, 4 lvl 2) = 3
    assert got[6] == 2 and got[12] == 3


def test_fd_audit_crafted(spark, tmp_path):
    spark.createDataFrame(
        [(0, "A", 0), (1, "B", 0), (2, "C", 1)],
        "n_nationkey bigint, n_name string, n_regionkey bigint",
    ).write.parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        [(0, "p0", "b1", "tX", 1, 1.0), (1, "p1", "b1", "tY", 1, 1.0),
         (2, "p2", "b2", "tZ", 1, 1.0)],
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size bigint, p_retailprice double",
    ).write.parquet(str(tmp_path / "part.parquet"))
    import datetime
    spark.createDataFrame(
        [(0, 0, "O", 1.0, datetime.datetime(1995, 1, 1), "1-URGENT"),
         (1, 0, "O", 1.0, datetime.datetime(1995, 1, 1), "1-URGENT")],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(0, "c0", 5, 0.0, "SEG"), (1, "c1", 6, 0.0, "SEG")],
        CUST_SCHEMA,
    ).write.parquet(str(tmp_path / "customer.parquet"))

    got = {
        (r["tbl"], r["lhs"]): (r["n_lhs"], r["n_violating"], r["holds"])
        for r in q_fd_audit(spark, str(tmp_path)).collect()
    }
    assert got[("nation", "n_name")] == (3, 0, 1)       # unique names hold
    assert got[("part", "p_brand")] == (2, 1, 0)        # b1 → {tX, tY}
    assert got[("orders", "o_orderpriority")] == (1, 0, 1)
    assert got[("customer", "c_mktsegment")] == (1, 1, 0)  # SEG → {5, 6}
