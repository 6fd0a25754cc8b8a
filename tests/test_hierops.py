"""Batch 51: hand-computed hierarchy fixtures — pointer doubling
resolves roots + exact depths in log rounds; subtree sums match a
pure-Python closure over the same heap-shaped forest."""

from ocr_to_csv_spark.functions.hierops import (
    q_redirect_resolve,
    q_subtree_sums,
)

CUST_SCHEMA = (
    "c_custkey bigint, c_name string, c_nationkey bigint, "
    "c_acctbal double, c_mktsegment string"
)


def _write(spark, tmp_path, n):
    rows = [(k, f"c{k}", 0, float(k), "S") for k in range(n)]
    spark.createDataFrame(rows, CUST_SCHEMA).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    return str(tmp_path)


def _depth(k):
    d = 0
    while k >= 2:
        k //= 2
        d += 1
    return d


def _root(k):
    while k >= 2:
        k //= 2
    return k


def test_redirect_resolve_hand_computed(spark, tmp_path):
    sf = _write(spark, tmp_path, 40)  # depth up to 5 → >1 doubling round
    got = {
        r["node"]: (r["root"], r["depth"])
        for r in q_redirect_resolve(spark, sf).collect()
    }
    assert got == {k: (_root(k), _depth(k)) for k in range(40)}


def test_subtree_sums_match_python_closure(spark, tmp_path):
    n = 32
    sf = _write(spark, tmp_path, n)
    exp_sum = {k: 0 for k in range(n)}
    exp_cnt = {k: 0 for k in range(n)}
    for k in range(n):
        a = k
        while True:
            exp_sum[a] += k * 100  # cents of acctbal=float(k)
            exp_cnt[a] += 1
            if a < 2:
                break
            a //= 2
    got = {
        r["node"]: (r["subtree_cents"], r["subtree_size"])
        for r in q_subtree_sums(spark, sf).collect()
    }
    assert got == {k: (exp_sum[k], exp_cnt[k]) for k in range(n)}
    # root 1 absorbs every node except the isolated root 0
    assert got[1][1] == n - 1 and got[0][1] == 1
