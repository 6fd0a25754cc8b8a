"""JSONL (newline-delimited JSON) ingest with malformed-line
quarantine — the interchange format public text corpora actually ship
in (The Pile, RedPajama, FineWeb releases are all JSONL/zst).

Spark-first: parsing is Spark's NATIVE json reader (JacksonParser on
the JVM, whole-stage codegen — never a Python loop) in PERMISSIVE mode
with a corrupt-record column, so one pass yields both the typed rows
and the quarantine stream. That is the same two-output contract as the
image/PDF/WAV/WARC decoders: malformed input NEVER fails a task, it
lands in a quarantine table with the raw line preserved for replay.

Scale notes (100 TB):
- The reader is splittable per file and parallel across files; schema
  is EXPLICIT (no inferSchema pass — inference would double-scan the
  corpus at ingest scale).
- ``.cache()`` before the corrupt-column split is the documented Spark
  requirement (the corrupt column is populated only when the raw line
  is retained end-to-end; filtering it uncached raises
  AnalysisException). At production scale, prefer writing the split
  eagerly (good → parquet, bad → quarantine sink) in the same job so
  the cache lives exactly one pass — ``ingest_jsonl`` below does that
  shape.

Reference parity: the reference ingests a directory of scans
(modules/image_scraper.py); this is the same entry point for the text
side of a crawl corpus. DuckDB's ``read_json(ignore_errors=true)``
drops what Spark quarantines, which makes the good-row set an exact
cross-engine oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_malformed"


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """One PERMISSIVE pass over JSONL → (typed good rows, quarantine).
    ``schema`` is the expected schema WITHOUT the corrupt column; a line
    that fails JSON parsing or type conversion appears only in the
    quarantine frame, raw line intact."""
    df = (
        spark.read.schema(f"{schema}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    df = df.cache()  # required before referencing the corrupt column
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad


def ingest_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    good_out: str,
    quarantine_out: str,
) -> tuple[int, int]:
    """Ingest-edge job: split one JSONL pass into a typed parquet table
    and a raw-line quarantine table (both written eagerly so the cache
    lives exactly one pass). Returns (n_good, n_quarantined)."""
    good, bad = read_jsonl_quarantine(spark, path, schema)
    good.write.mode("overwrite").parquet(good_out)
    bad.write.mode("overwrite").parquet(quarantine_out)
    g = spark.read.parquet(good_out).count()
    b = spark.read.parquet(quarantine_out).count()
    return g, b
