"""Dynamic partition pruning evidence: when a partitioned fact table
joins a filtered dimension on the partition column, Catalyst must plan
a dynamicpruning subquery on the fact scan — at 100 TB this is the
difference between scanning one partition and scanning the table.
The engine relies on built-in DPP (SURVEY.md §4.2); this test pins the
behavior so a config regression (or a partition-layout change that
defeats it) fails loudly."""

from pyspark.sql import functions as F


def test_dpp_prunes_fact_partitions(spark, tmp_path):
    fact_dir = str(tmp_path / "fact")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.withColumn("ship_year", F.year("l_shipdate")).write.partitionBy(
        "ship_year"
    ).parquet(fact_dir)

    fact = spark.read.parquet(fact_dir)
    years = sorted(
        r["ship_year"] for r in fact.select("ship_year").distinct().collect()
    )
    assert len(years) >= 3, "need several partitions for pruning to matter"
    dim = spark.createDataFrame(
        [(y, "keep" if y == years[0] else "drop") for y in years],
        "d_year int, tag string",
    )

    joined = fact.join(dim, fact.ship_year == dim.d_year).filter(
        F.col("tag") == "keep"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    # and the join result is the pruned year's rows exactly
    got = joined.count()
    want = fact.filter(F.col("ship_year") == years[0]).count()
    assert got == want > 0
