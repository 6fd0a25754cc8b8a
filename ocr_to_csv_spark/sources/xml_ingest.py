"""XML ingest with malformed-row quarantine — Spark 4's NATIVE xml
data source (the spark-xml package was merged upstream), completing
the ingest-edge family (parquet/orc • JSONL • CSV • WARC • PDF • XML):
feeds, sitemaps, and enterprise exports still arrive as XML.

Same one-pass contract as ``sources/jsonl.py``: PERMISSIVE mode with a
corrupt-record column splits typed rows from quarantine. Observed
Spark behavior, pinned by test: a row whose field fails type
conversion yields a malformed entry with all schema fields null; for
multiline documents the corrupt column carries the enclosing raw text
block (coarser than the JSON/CSV per-line raw — the reliable
quarantine signal is the malformed COUNT plus null fields, and the
test asserts exactly that). A missing element is null, NOT malformed
(the JSON convention).

Scale notes (100 TB): rowTag streaming parse is splittable per file;
schema explicit (inference would double-scan). Same ``.cache()``
one-pass split requirement as JSONL/CSV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_malformed"


def read_xml_quarantine(
    spark: SparkSession, path: str, schema: str, row_tag: str
) -> tuple[DataFrame, DataFrame]:
    """One PERMISSIVE pass over XML → (typed good rows, quarantine).
    ``schema`` excludes the corrupt column."""
    df = (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .schema(f"{schema}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .load(path)
    )
    df = df.cache()  # required before referencing the corrupt column
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_block")
    )
    return good, bad
