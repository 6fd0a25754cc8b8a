"""Build the spark-submit deployment artifact (north_rule: "ships via
spark-submit --py-files").

Produces ``dist/ocr_to_csv_spark.zip`` containing the package, importable
by executors, plus prints the submit command. No third-party deps beyond
what a Spark runtime already carries (numpy/pandas/pyarrow).

Usage:  python tools/package.py
        spark-submit --py-files dist/ocr_to_csv_spark.zip your_job.py
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "ocr_to_csv_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg_root = os.path.join(REPO, "ocr_to_csv_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    print(f"submit with: spark-submit --py-files {path} <job.py>")
