"""Batch 34: the join-view delta decomposition must cover every
(order, lineitem) pair exactly once — checked against a direct
join-aggregate over the same data, on a corpus slice where orders and
lineitems land on BOTH sides of their hash splits."""

from pyspark.sql import functions as F

from ocr_to_csv_spark.functions.dataops2 import q_ivm_join, q_l_diversity

SF = "/root/testdata/sf0.001"


def test_ivm_join_equals_full_rebuild(spark):
    got = {r["o_custkey"]: (r["revenue_cents"], r["n_lines"])
           for r in q_ivm_join(spark, SF).collect()}
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    full = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("rc"),
            F.count("*").alias("n"),
        )
    )
    want = {r["o_custkey"]: (r["rc"], r["n"]) for r in full.collect()}
    assert got == want and len(got) > 0


def test_l_diversity_classes_are_low_diversity(spark):
    rows = q_l_diversity(spark, SF).collect()
    assert all(r["distinct_segments"] < 3 for r in rows)
