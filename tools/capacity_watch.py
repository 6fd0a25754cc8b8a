"""Background watcher: probe delivered host capacity periodically; when a
clean window appears (raw 8→32-proc scaling ≥ threshold), immediately run
the scaling bench and save the result to BENCH_CLEAN.md + a JSON log.
Never touches git (the foreground session reviews and commits results).
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
from tools.scaling_bench import calibrate  # noqa: E402

THRESH = 2.8
PROBE_EVERY = 600
MAX_HOURS = 5.0


def main():
    t_end = time.time() + MAX_HOURS * 3600
    log = open("/root/repo/capacity_watch.jsonl", "a")
    ran = 0
    while time.time() < t_end and ran < 2:
        lo, hi = calibrate(8), calibrate(32)
        ratio = hi / lo
        rec = {"ts": time.time(), "c8": round(lo), "c32": round(hi),
               "ratio": round(ratio, 2)}
        print(json.dumps(rec), file=log, flush=True)
        if ratio >= THRESH:
            rec["action"] = "bench"
            print(json.dumps(rec), file=log, flush=True)
            subprocess.run(
                [sys.executable, "tools/scaling_bench.py", "--docs", "2560",
                 "--out", "BENCH_CLEAN.md"],
                cwd="/root/repo", capture_output=True, text=True, timeout=1200,
            )
            ran += 1
        time.sleep(PROBE_EVERY)


if __name__ == "__main__":
    main()
