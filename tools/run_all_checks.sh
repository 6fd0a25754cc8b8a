#!/bin/sh
# One-button verification: the full correctness + bench gate.
set -e
cd "$(dirname "$0")/.."
echo "== pytest =="
python -m pytest tests/ -x -q
echo "== Spark-vs-DuckDB oracle gate (52 queries) =="
python tools/check_queries.py /root/testdata/sf0.01
echo "== headline bench =="
python bench.py
echo "== packaging =="
python tools/package.py
echo "ALL CHECKS PASSED"
