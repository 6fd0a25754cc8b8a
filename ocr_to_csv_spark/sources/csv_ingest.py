"""CSV ingest with malformed-row quarantine — the same one-pass
good/quarantine contract as ``sources/jsonl.py``, for the format the
reference itself emits (its CSV sink, ``main.py``'s output side) and
every spreadsheet-born dataset arrives in.

Spark-first: the NATIVE csv reader (UnivocityParser on the JVM) in
PERMISSIVE mode with a corrupt-record column. Spark's strictness,
probed and pinned by tests: a row is malformed iff it has EXTRA
columns, MISSING columns, or a failed type cast (quoted delimiters are
fine); malformed rows keep their parseable fields AND carry the raw
line. The quarantine stream preserves the raw line for replay.

The cross-engine oracle is DuckDB ``read_csv(ignore_errors=true,
null_padding=false)`` with explicit columns, which drops EXACTLY the
rows Spark marks malformed — verified row-for-row in the gate.

Scale notes (100 TB): explicit schema (no inference pass); splittable
per file; the ``.cache()`` one-pass split is the same documented Spark
requirement as the JSONL path — ``ingest_csv`` writes both sides
eagerly so the cache lives exactly one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_malformed"


def read_csv_quarantine(
    spark: SparkSession, path: str, schema: str, header: bool = False
) -> tuple[DataFrame, DataFrame]:
    """One PERMISSIVE pass over CSV → (typed good rows, quarantine of
    raw malformed lines). ``schema`` excludes the corrupt column."""
    df = (
        spark.read.schema(f"{schema}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .csv(path)
    )
    df = df.cache()  # required before referencing the corrupt column
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad


def ingest_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    good_out: str,
    quarantine_out: str,
    header: bool = False,
) -> tuple[int, int]:
    """Ingest-edge job: split one CSV pass into a typed parquet table
    and a raw-line quarantine table. Returns (n_good, n_quarantined)."""
    good, bad = read_csv_quarantine(spark, path, schema, header=header)
    good.write.mode("overwrite").parquet(good_out)
    bad.write.mode("overwrite").parquet(quarantine_out)
    g = spark.read.parquet(good_out).count()
    b = spark.read.parquet(quarantine_out).count()
    return g, b
