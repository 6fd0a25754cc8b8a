"""Batch 13 (functions/tpch.py): hand-computed mini-fixtures for the
TPC-H shapes — tie-safety of the global-max join, the integer 20%%-of-avg
threshold, the exactly-one-offender filter, semi-join non-duplication,
and the LSH-gated edit distance."""

import datetime

from pyspark.sql import functions as F

from ocr_to_csv_spark.functions.tpch import (
    LEV_MAX,
    q_order_priority,
    q_small_qty_revenue,
    q_sole_return_supplier,
    q_top_supplier,
)

TS = datetime.datetime


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.parquet(
        str(tmp_path / f"{name}.parquet")
    )


LI_SCHEMA = (
    "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
    " l_linenumber int, l_quantity double, l_extendedprice double,"
    " l_discount double, l_tax double, l_returnflag string,"
    " l_linestatus string, l_shipdate timestamp"
)


def _li(ok, sk, qty, price, disc, flag, ship):
    return (ok, 1, sk, 1, qty, price, disc, 0.0, flag, "O", ship)


def test_top_supplier_keeps_all_tied_maxima(spark, tmp_path):
    ship = TS(1996, 2, 1)
    rows = [
        _li(1, 10, 1.0, 100.0, 0.0, "N", ship),  # supp 10: 100.00
        _li(2, 20, 1.0, 50.0, 0.0, "N", ship),   # supp 20: 50+50 = 100.00
        _li(3, 20, 1.0, 50.0, 0.0, "N", ship),
        _li(4, 30, 1.0, 99.99, 0.0, "N", ship),  # supp 30: below
        _li(5, 40, 1.0, 500.0, 0.0, "N", TS(1999, 1, 1)),  # out of window
    ]
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    _write(
        spark, tmp_path, "supplier",
        [(10, "s10", 1, 0.0), (20, "s20", 1, 0.0), (30, "s30", 1, 0.0),
         (40, "s40", 1, 0.0)],
        "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    )
    got = {r["s_suppkey"]: r for r in
           q_top_supplier(spark, str(tmp_path)).collect()}
    assert set(got) == {10, 20}  # tie-safe: BOTH maxima survive
    assert got[10]["total_revenue"] == 100.0
    assert got[20]["total_revenue"] == 100.0


def test_small_qty_threshold_is_strict_20_pct(spark, tmp_path):
    ship = TS(1996, 2, 1)
    # part 1: quantities 10, 10, 100 -> avg = 40, 20% = 8.0
    #   qty 10 lines are NOT below 8 -> excluded; add qty 7 -> included
    rows = [
        _li(1, 1, 10.0, 11.0, 0.0, "N", ship),
        _li(2, 1, 10.0, 12.0, 0.0, "N", ship),
        _li(3, 1, 100.0, 13.0, 0.0, "N", ship),
        _li(4, 1, 7.0, 700.0, 0.0, "N", ship),
    ]
    # all lines point at partkey 1 via _li's fixed l_partkey=1
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    _write(
        spark, tmp_path, "part",
        [(1, "p", "Brand#12", "PROMO", 1, 1.0)],
        "p_partkey bigint, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    r = q_small_qty_revenue(spark, str(tmp_path)).collect()[0]
    # avg qty = 127/4 = 31.75 -> 20% = 6.35 -> only... qty7 > 6.35? no!
    # 7 < 6.35 is false -> nothing qualifies. Recompute: sum=127, cnt=4,
    # threshold qty*5*4 < 127 -> qty < 6.35 -> no line qualifies.
    assert (r["n_small_lines"], r["avg_yearly"]) == (0, None)


def test_small_qty_includes_strictly_below(spark, tmp_path):
    ship = TS(1996, 2, 1)
    # quantities 5, 45, 50 -> sum 100, cnt 3 -> qty < 100/15 = 6.67
    rows = [
        _li(1, 1, 5.0, 70.0, 0.0, "N", ship),   # 5 < 6.67 -> in
        _li(2, 1, 45.0, 10.0, 0.0, "N", ship),
        _li(3, 1, 50.0, 10.0, 0.0, "N", ship),
    ]
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    _write(
        spark, tmp_path, "part",
        [(1, "p", "Brand#12", "PROMO", 1, 1.0)],
        "p_partkey bigint, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    r = q_small_qty_revenue(spark, str(tmp_path)).collect()[0]
    assert r["n_small_lines"] == 1
    assert r["avg_yearly"] == 70.0 * 100 / 700.0  # = 10.0


def test_order_priority_semi_join_counts_orders_once(spark, tmp_path):
    od = TS(1996, 2, 1)
    _write(
        spark, tmp_path, "orders",
        [(1, 1, "O", 1.0, od, "1-URGENT"), (2, 1, "O", 1.0, od, "1-URGENT"),
         (3, 1, "O", 1.0, od, "2-HIGH")],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    late, ontime = TS(1996, 3, 15), TS(1996, 2, 10)
    rows = [
        _li(1, 1, 1.0, 1.0, 0.0, "N", late),   # order 1: TWO late lines
        _li(1, 1, 1.0, 1.0, 0.0, "N", late),   # must still count once
        _li(2, 1, 1.0, 1.0, 0.0, "N", ontime),  # order 2: on time
        _li(3, 1, 1.0, 1.0, 0.0, "N", late),   # order 3: late
    ]
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    got = {r["o_orderpriority"]: r["order_count"] for r in
           q_order_priority(spark, str(tmp_path)).collect()}
    assert got == {"1-URGENT": 1, "2-HIGH": 1}


def test_sole_return_supplier_exactly_one_offender(spark, tmp_path):
    ship = TS(1996, 2, 1)
    rows = [
        # order 1: suppliers 10, 20; only 10 returned -> 10 blamed
        _li(1, 10, 1.0, 1.0, 0.0, "R", ship),
        _li(1, 20, 1.0, 1.0, 0.0, "N", ship),
        # order 2: suppliers 10, 20; BOTH returned -> nobody blamed
        _li(2, 10, 1.0, 1.0, 0.0, "R", ship),
        _li(2, 20, 1.0, 1.0, 0.0, "R", ship),
        # order 3: single-supplier order with return -> not multi-supplier
        _li(3, 10, 1.0, 1.0, 0.0, "R", ship),
        # order 4: supplier 20 returned twice (two lines) -> count once
        _li(4, 20, 1.0, 1.0, 0.0, "R", ship),
        _li(4, 20, 2.0, 1.0, 0.0, "R", ship),
        _li(4, 30, 1.0, 1.0, 0.0, "N", ship),
    ]
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    _write(
        spark, tmp_path, "supplier",
        [(10, "s10", 1, 0.0), (20, "s20", 1, 0.0), (30, "s30", 1, 0.0)],
        "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    )
    got = {r["s_name"]: r["numwait"] for r in
           q_sole_return_supplier(spark, str(tmp_path)).collect()}
    assert got == {"s10": 1, "s20": 1}


def test_lev_verify_gated_by_lsh_and_thresholded(spark):
    # runs on the real sf0.001 tables: every output pair must be an LSH
    # candidate, lev must equal a locally-computed reference, verified
    # must match the threshold
    from ocr_to_csv_spark.functions.dedup import q_lsh_pairs
    from ocr_to_csv_spark.functions.tpch import LEV_PREFIX, q_lev_verify

    sf = "/root/testdata/sf0.001"
    pairs = {(r["doc_a"], r["doc_b"])
             for r in q_lsh_pairs(spark, sf).collect()}
    texts = {r["doc_id"]: r["text"]
             for r in spark.read.parquet(f"{sf}/documents.parquet").collect()}

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    out = q_lev_verify(spark, sf).collect()
    assert out, "expected at least one LSH candidate pair at sf0.001"
    for r in out:
        assert (r["doc_a"], r["doc_b"]) in pairs
        want = lev(texts[r["doc_a"]][:LEV_PREFIX],
                   texts[r["doc_b"]][:LEV_PREFIX])
        assert r["lev"] == want
        assert r["verified"] == int(want <= LEV_MAX)
