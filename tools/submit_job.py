"""Deployment-contract smoke job: run the extraction pipeline and two
query ops importing ONLY from the packaged zip (north_rule ship path:
``spark-submit --py-files dist/ocr_to_csv_spark.zip``).

Usage:
    python tools/package.py
    spark-submit --master local[8] \
        --py-files dist/ocr_to_csv_spark.zip \
        tools/submit_job.py <corpus_dir> <sf_dir>

Prints one JSON line {"spans": N, "rows": N, "q_pricing": N, "q_dedup": N}
on success. The job intentionally lives OUTSIDE the package so a missing
module in the zip fails loudly here rather than on a cluster.
"""

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    corpus_dir, sf_dir = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("submit_smoke").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # imports resolve from the --py-files zip on the executors AND driver
    from ocr_to_csv_spark.extraction import pipeline
    from ocr_to_csv_spark.functions import relational, textops

    tabs = pipeline.load_corpus(spark, corpus_dir)
    res = pipeline.extract(spark, tabs["documents"], tabs["media"], tabs["aliases"])
    out = {
        "spans": res["spans"].count(),
        "rows": res["rows"].count(),
        "q_pricing": relational.q_pricing_summary(spark, sf_dir).count(),
        "q_dedup": textops.q_dedup_exact(spark, sf_dir).count(),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
