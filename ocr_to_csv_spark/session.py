"""SparkSession factory with scale-oriented defaults.

Single place where the engine's Spark configuration lives so tests, bench
and the driver contract all run with the same plan-shaping knobs:

- AQE on (coalesce shuffle partitions, skew-join splitting) — SURVEY.md §4.3.
- Arrow enabled for pandas UDF transport with a bounded batch size so wide
  binary columns (cell images) don't blow executor memory.
- shuffle partitions sized for the local[32] sandbox; on a real cluster this
  is overridden via spark-submit conf (the code never hard-codes partition
  counts into logic, only into this factory).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "ocr_to_csv_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's tuned defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def sf_dir(default: str = "/root/testdata/sf0.1") -> str:
    """Benchmark scale-factor directory (driver contract)."""
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)
