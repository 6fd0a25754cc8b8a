"""Bench q_cosine_topk (fold expression) vs cosine_topk_fast (numpy
matmul per Arrow batch, map-side top-k) at growing embedding counts —
the evidence behind calling the matmul kernel the production path.

Scales the sf0.1 embeddings table by duplication with shifted vec_ids
(candidates only; the query set stays fixed), min-of-N timing in one
warm JVM. Usage: python tools/cosine_crossover.py [multipliers...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    import ocr_to_csv_spark.functions.similarity as sim
    import ocr_to_csv_spark.functions.util as util
    from ocr_to_csv_spark.session import get_spark

    spark = get_spark("cosine_xover",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mults = [int(m) for m in sys.argv[1:]] or [1, 10, 50]

    def scaled(mult: int):
        e = spark.read.parquet(f"{sf}/embeddings.parquet")
        parts = [e] + [
            e.filter(F.col("vec_id") >= sim.N_QUERIES)
            .withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
            for i in range(1, mult)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.repartition(32)

    orig = util.table
    print(f"| N (embeddings) | fold q_cosine_topk | matmul cosine_topk_fast |")
    print(f"|---:|---:|---:|")
    for mult in mults:
        d = f"/tmp/emb_xover_{mult}.parquet"
        if not os.path.exists(d):
            scaled(mult).write.mode("overwrite").parquet(d)

        def fake(spark_, sf_dir, name, spread=False, _d=d):
            return spark_.read.parquet(_d)

        util.table = fake
        sim.table = fake
        times = {}
        for label, fn in (("fold", sim.q_cosine_topk),
                          ("fast", sim.cosine_topk_fast)):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf).count()
                best = min(best, time.time() - t0)
            times[label] = best
        n = spark.read.parquet(d).count()
        print(f"| {n} | {times['fold']:.3f} s | {times['fast']:.3f} s |")
    util.table = orig
    sim.table = orig
    spark.stop()


if __name__ == "__main__":
    main()
