"""Per-stage wall-time audit of one extraction run — the measurement
tool behind the serial-floor / straggler analysis in BENCH.md.

Runs a warm extract, then one instrumented extract, and prints every
stage with its wall time, scheduler gap, task count, and total executor
core-seconds (via the Spark UI REST API). Interpretation:

- ``wall`` far above ``core_s / cpus`` on a big stage = straggler tail
  (usually a mega-document);
- many small stages with wall ≈ 0.1-0.9 s = the per-job serial floor
  (AQE stage barriers + staging commits) that amortizes away at real
  corpus sizes / on real clusters;
- ``sum stage wall`` vs total = driver/scheduling gaps.

Usage: python tools/floor_audit.py [--docs 2560]
"""

from __future__ import annotations

import argparse
import datetime
import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2560)
    a = ap.parse_args()

    from bench import _corpus
    from ocr_to_csv_spark.extraction import pipeline
    from ocr_to_csv_spark.session import get_spark

    spark = get_spark(
        "floor_audit",
        extra_conf={"spark.ui.showConsoleProgress": "false",
                    "spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    tabs = pipeline.load_corpus(spark, _corpus(a.docs))
    wt = pipeline.load_corpus(spark, _corpus(24, seed=7))
    pipeline.extract(spark, wt["documents"], wt["media"], wt["aliases"])[
        "spans"
    ].count()

    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]
    stages_url = f"{ui}/api/v1/applications/{app}/stages"
    before = {s["stageId"] for s in json.load(urllib.request.urlopen(stages_url))}

    t0 = time.time()
    res = pipeline.extract(spark, tabs["documents"], tabs["media"], tabs["aliases"])
    n = res["spans"].count()
    wall = time.time() - t0

    def ts(x: str) -> float:
        return datetime.datetime.strptime(x[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    stages = json.load(urllib.request.urlopen(f"{stages_url}?status=complete"))
    new = sorted(
        (s for s in stages if s["stageId"] not in before),
        key=lambda s: s["stageId"],
    )
    tot = 0.0
    print(f"WALL {wall:.2f}s spans {n}")
    for s in new:
        w = ts(s["completionTime"]) - ts(s["firstTaskLaunchedTime"])
        gap = ts(s["firstTaskLaunchedTime"]) - ts(s["submissionTime"])
        tot += w
        print(
            f"  st{s['stageId']:4d} {s['name'].split(' at ')[0][:34]:34s} "
            f"wall {w:6.2f} gap {gap:5.2f} tasks {s['numCompleteTasks']:3d} "
            f"core_s {s['executorRunTime'] / 1000:7.1f}"
        )
    print(f"sum stage wall: {tot:.2f}s (total {wall:.2f}s → driver/gaps {wall - tot:.2f}s)")
    spark.stop()


if __name__ == "__main__":
    main()
