"""AQE skew-join evidence: when one join key carries most of the rows,
adaptive execution must split the oversized shuffle partition instead
of letting one task run the whole join — at 100 TB the difference
between a straggler pinning the stage and even task times. Pins the
behavior (with thresholds scaled to sandbox data) so a config
regression fails loudly."""

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark, tmp_path):
    # 95% of fact rows share one key; dim is uniform
    n = 200_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
    )
    fact.write.parquet(str(tmp_path / "fact"))
    dim.write.parquet(str(tmp_path / "dim"))

    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # sandbox-scale thresholds: the skewed partition is ~MBs, not GBs
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        # force a sort-merge join so the skew handler (not broadcast)
        # is what saves the stage
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        f = spark.read.parquet(str(tmp_path / "fact"))
        d = spark.read.parquet(str(tmp_path / "dim"))
        j = f.join(d, "k")
        assert j.count() == n  # every fact row matches exactly one dim row
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skewed" in plan.lower(), plan[:3000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
