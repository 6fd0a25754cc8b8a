"""Adversarial-skew extraction bench (VERDICT r3 item 5): inject ONE
mega-document (a single rendered sheet page with >= 10^4 table cells)
into a small corpus and publish per-task straggler evidence for the
extraction pipeline's cell-granularity salting claim (SCALE.md §3):
the (doc_id, offset, row) repartition before the OCR-heavy classify
stage spreads the mega page across tasks, so max-task stays within a
small factor of the median even though one document holds ~100x the
median document's cells.

Run the counterfactual with --no-salt (document-
granularity distribution): the same corpus then shows one task
carrying the whole mega page in the classify stage.

Per-task times come from Spark's event log (SparkListenerTaskEnd),
the same evidence a cluster UI shows. Usage:

    python tools/skew_bench.py [--docs 512] [--rows 1600] [--no-salt]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import random
import shutil
import statistics
import sys
import time

sys.path.insert(0, ".")


def _build_corpus(n_docs: int, mega_rows: int) -> str:
    """Base corpus + one appended mega-image document whose single page
    holds mega_rows x ~7 cells (>= 10^4 at 1600 rows)."""
    import pandas as pd

    from ocr_to_csv_spark.datagen.gen import (
        HEADER,
        _sheet_rows,
        corpus_is_current,
        write_corpus,
    )
    from ocr_to_csv_spark.imaging import png, render

    d = f"/tmp/ocr2csv_skew_corpus_{n_docs}_{mega_rows}"
    marker = os.path.join(d, "_mega_marker.txt")
    if corpus_is_current(d) and os.path.exists(marker):
        return d
    shutil.rmtree(d, ignore_errors=True)
    write_corpus(d, n_docs, seed=42)
    rng = random.Random("skew-mega")
    t0 = time.time()
    ground = _sheet_rows(rng, mega_rows)
    tab = [HEADER] + [[str(i + 1)] + r for i, r in enumerate(ground)]
    # scale=1 keeps the page under the decoders' 64 MPx OOM guard
    # (a deliberate defense this bench must not weaken)
    page = render.render_page(tab, dates=["03/15/1997"], scale=1)
    n_cells = len(tab) * len(tab[0])
    blob = png.encode_gray(page)
    print(
        f"mega page: {page.shape[0]}x{page.shape[1]} px, "
        f"{len(ground)} rows ({n_cells} cells), png {len(blob) // 1024} "
        f"KiB, rendered in {time.time() - t0:.1f}s"
    )
    assert n_cells >= 10_000, "mega page must hold >= 10^4 cells"
    for t in ("documents", "media"):
        p = os.path.join(d, f"{t}.parquet")
        if os.path.isfile(p):  # small corpora write single files
            os.rename(p, p + ".file")
            os.makedirs(p)
            os.rename(p + ".file", os.path.join(p, "part-0.parquet"))
    import pyarrow as pa
    import pyarrow.parquet as pq

    def _append_shard(tab: str, rows: list[dict]) -> None:
        # schema copied from a base shard: pandas inference would type
        # the all-None span text as int32 and break the corpus scan
        base = sorted(glob.glob(os.path.join(d, f"{tab}.parquet", "*")))[0]
        schema = pq.read_schema(base)
        pq.write_table(
            pa.Table.from_pylist(rows, schema=schema),
            os.path.join(d, f"{tab}.parquet", "part-mega.parquet"),
        )

    _append_shard(
        "documents",
        [
            {
                "doc_id": "doc-mega00",
                "spans": [
                    {
                        "kind": "image",
                        "text": None,
                        "media_ref": "m-mega00-0",
                        "offset": 0,
                    }
                ],
            }
        ],
    )
    _append_shard(
        "media",
        [{"media_ref": "m-mega00-0", "content": blob, "width": 0,
          "height": 0}],
    )
    with open(marker, "w") as f:
        f.write(str(n_cells))
    return d


def _stage_stats(event_dir: str) -> list[dict]:
    stages: dict[int, dict] = {}
    paths = [
        os.path.join(r, f)
        for r, _, fs in os.walk(event_dir)
        for f in fs
        if not f.startswith(".")
    ]
    for path in paths:
        with open(path, errors="replace") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if not isinstance(ev, dict):
                    continue
                if ev.get("Event") == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    ti = ev["Task Info"]
                    dur = (ti["Finish Time"] - ti["Launch Time"]) / 1000
                    stages.setdefault(sid, {"tasks": []})["tasks"].append(dur)
                elif ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    scopes = []
                    for ri in si.get("RDD Info", []):
                        sc = ri.get("Scope")
                        if not sc:
                            continue
                        try:
                            nm = json.loads(sc).get("name", "")
                        except json.JSONDecodeError:
                            continue
                        if nm and nm not in scopes:
                            scopes.append(nm)
                    label = next(
                        (n for n in scopes if "mapInPandas" in n), None
                    ) or next(
                        (n for n in scopes if "Scan" in n or "parquet" in n),
                        None,
                    ) or (scopes[0] if scopes else si["Stage Name"])
                    stages.setdefault(si["Stage ID"], {"tasks": []})[
                        "name"
                    ] = "+".join(scopes[:3]) or label
    out = []
    for sid, s in stages.items():
        ts = s["tasks"]
        if not ts:
            continue
        out.append(
            {
                "stage": sid,
                "name": s.get("name", "?"),
                "n_tasks": len(ts),
                "total_s": sum(ts),
                "median_s": statistics.median(ts),
                "max_s": max(ts),
            }
        )
    return sorted(out, key=lambda r: -r["total_s"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=512)
    ap.add_argument("--rows", type=int, default=1800)
    ap.add_argument("--no-salt", action="store_true",
                    help="document-granularity counterfactual")
    a = ap.parse_args()

    corpus = _build_corpus(a.docs, a.rows)
    ev_dir = f"/tmp/ocr2csv_skew_events_{os.getpid()}"
    os.makedirs(ev_dir, exist_ok=True)

    from ocr_to_csv_spark.extraction import pipeline
    from ocr_to_csv_spark.session import get_spark

    spark = get_spark(
        "skew_bench",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",  # parse plain JSON lines
            "spark.eventLog.dir": f"file://{ev_dir}",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    tabs = pipeline.load_corpus(spark, corpus)
    t0 = time.time()
    res = pipeline.extract(
        spark, tabs["documents"], tabs["media"], tabs["aliases"],
        _salt_granularity="doc" if a.no_salt else "cell",
    )
    n_spans = res["spans"].count()
    wall = time.time() - t0
    mega = res["spans"].filter("doc_id = 'doc-mega00'").count()
    print(
        f"\nextract: {a.docs}+1 docs, {n_spans} spans ({mega} from the "
        f"mega doc), wall {wall:.1f}s "
        f"[salt={'doc (counterfactual)' if a.no_salt else 'cell'}]\n"
    )
    spark.stop()  # flush the event log
    rows = _stage_stats(ev_dir)[:6]
    print("| stage | tasks | total task-s | median s | max s | max/median |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        ratio = r["max_s"] / r["median_s"] if r["median_s"] else float("inf")
        nm = r["name"].split(" at ")[0][:44]
        print(
            f"| {r['stage']} ({nm}) | {r['n_tasks']} | {r['total_s']:.1f} "
            f"| {r['median_s']:.2f} | {r['max_s']:.2f} | {ratio:.1f}x |"
        )
    shutil.rmtree(ev_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
