"""Table-maintenance planning, batch 96: the two queries an Iceberg
table operator runs before touching 100 TB — a compaction (binPack
rewrite) PLAN over the file manifest, and a footer-stats pruning audit
that predicts how much of the table a predicate actually scans. The
catalog layer already WRITES clustered/bucketed/bloom-indexed files
(`sources/catalog.py`) and tracks snapshots (`sources/snapshots.py`);
these queries are the read-side planning analytics over that metadata.

Scale design (100 TB):
- Both queries operate on the FILE MANIFEST, not the data: the input
  collapses to one row per file via a single keyed aggregate (here the
  manifest is derived from `orders` by its time-partitioned ingest
  grain, month — the shape a `write_clustered` on o_orderdate
  produces). 100 TB at a 512 MB target is ~200k manifest rows; the
  global ORDER BY size window in the packing step is metadata-scale by
  construction (the one place a single-partition window is the RIGHT
  plan — it is the same size as the driver-side list Iceberg's
  BinPackStrategy sorts).
- `compaction_plan` uses the prefix-sum relaxation of greedy binPack:
  files sorted by size descending, bin = floor((running_bytes -
  bytes) / TARGET) — each file lands in the bin where its first byte
  falls. Unlike true next-fit (a stateful reset that cannot be a
  prefix function), this is one window expression, deterministic, and
  over-fills a bin by at most one file — the same guarantee Iceberg's
  packer gives via its open-file overflow.
- `manifest_prune` evaluates a date-range predicate against per-file
  (min, max) footer stats — exactly Spark/Iceberg file skipping — and
  reports skipped vs scanned files plus the residual in-file
  selectivity, all exact integers (ratio in milli-units).

Reference parity: the reference has no storage layer (it re-reads its
input images every run — `main.py` walks a directory); this family is
the catalog-maintenance surface a 10^12-doc corpus requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import table

TARGET_BYTES = 8192  # packing target; 512 MB at production scale
ROW_OVERHEAD = 32    # fixed per-row byte cost in the size proxy
PRUNE_FROM = "1997-01-01"
PRUNE_TO = "1997-07-01"  # half-open
PRUNE_MIN_PRICE = 150000.0


def _manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per data file: orders' time-partitioned ingest grain
    (month) with exact byte-proxy size and o_orderdate footer stats."""
    o = table(spark, sf_dir, "orders")
    fid = F.date_trunc("month", "o_orderdate").alias("file_id")
    size = (
        F.lit(ROW_OVERHEAD)
        + F.length("o_orderstatus")
        + F.length("o_orderpriority")
    ).cast("long")
    return o.groupBy(fid).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(size).alias("bytes"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )


_MANIFEST_SQL = f"""
SELECT date_trunc('month', o_orderdate) AS file_id,
       count(*)::BIGINT AS n_rows,
       sum({ROW_OVERHEAD} + length(o_orderstatus)
           + length(o_orderpriority))::BIGINT AS bytes,
       min(o_orderdate) AS min_date,
       max(o_orderdate) AS max_date
FROM orders GROUP BY 1
"""


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binPack rewrite plan: files sorted by size desc (file_id
    tiebreak), bin = the TARGET_BYTES stripe the file's first byte
    lands in. Emits per-bin file count, bytes, and row count — the
    rewrite task list's shape. Exact integers."""
    m = _manifest(spark, sf_dir)
    w = Window.orderBy(F.col("bytes").desc(), F.col("file_id"))
    binned = m.withColumn(
        "bin",
        F.floor(
            (F.sum("bytes").over(w) - F.col("bytes")) / F.lit(TARGET_BYTES)
        ).cast("long"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("bytes").alias("bin_bytes"),
            F.sum("n_rows").alias("bin_rows"),
        )
        .orderBy("bin")
    )


_COMPACTION_SQL = f"""
WITH manifest AS ({_MANIFEST_SQL}),
binned AS (
    SELECT *,
           CAST(floor(
               (sum(bytes) OVER (ORDER BY bytes DESC, file_id) - bytes)
               / {TARGET_BYTES}.0
           ) AS BIGINT) AS bin
    FROM manifest
)
SELECT bin, count(*)::BIGINT AS n_files,
       sum(bytes)::BIGINT AS bin_bytes,
       sum(n_rows)::BIGINT AS bin_rows
FROM binned GROUP BY bin ORDER BY bin
"""


def q_manifest_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-skipping audit for `o_orderdate ∈ [PRUNE_FROM, PRUNE_TO)
    AND o_totalprice > PRUNE_MIN_PRICE`: a file is skipped when its
    (min_date, max_date) footer interval misses the range — the date
    conjunct is the only stats-supported one, exactly Spark's parquet
    row-group / Iceberg manifest filtering. Emits total/skipped/
    scanned file counts, rows inside scanned files, rows actually
    matching the full predicate, and the milli skip ratio."""
    m = _manifest(spark, sf_dir)
    lo = F.lit(PRUNE_FROM).cast("timestamp")
    hi = F.lit(PRUNE_TO).cast("timestamp")
    scanned = (F.col("max_date") >= lo) & (F.col("min_date") < hi)
    files = m.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(scanned.cast("long")).alias("files_scanned"),
        F.sum(F.when(scanned, F.col("n_rows")).otherwise(0)).alias(
            "rows_in_scanned"
        ),
    )
    o = table(spark, sf_dir, "orders")
    matched = o.filter(
        (F.col("o_orderdate") >= lo)
        & (F.col("o_orderdate") < hi)
        & (F.col("o_totalprice") > F.lit(PRUNE_MIN_PRICE))
    ).agg(F.count(F.lit(1)).alias("rows_matched"))
    return files.crossJoin(F.broadcast(matched)).select(
        "n_files",
        (F.col("n_files") - F.col("files_scanned")).alias("files_skipped"),
        "files_scanned",
        "rows_in_scanned",
        "rows_matched",
        F.floor(
            (F.col("n_files") - F.col("files_scanned"))
            * 1000
            / F.col("n_files")
        )
        .cast("long")
        .alias("skip_ratio_milli"),
    )


_PRUNE_SQL = f"""
WITH manifest AS ({_MANIFEST_SQL}),
files AS (
    SELECT count(*)::BIGINT AS n_files,
           sum(CASE WHEN max_date >= TIMESTAMP '{PRUNE_FROM}'
                     AND min_date <  TIMESTAMP '{PRUNE_TO}'
                    THEN 1 ELSE 0 END)::BIGINT AS files_scanned,
           sum(CASE WHEN max_date >= TIMESTAMP '{PRUNE_FROM}'
                     AND min_date <  TIMESTAMP '{PRUNE_TO}'
                    THEN n_rows ELSE 0 END)::BIGINT AS rows_in_scanned
    FROM manifest
),
matched AS (
    SELECT count(*)::BIGINT AS rows_matched FROM orders
    WHERE o_orderdate >= TIMESTAMP '{PRUNE_FROM}'
      AND o_orderdate <  TIMESTAMP '{PRUNE_TO}'
      AND o_totalprice > {PRUNE_MIN_PRICE}
)
SELECT n_files,
       (n_files - files_scanned)::BIGINT AS files_skipped,
       files_scanned, rows_in_scanned, rows_matched,
       CAST(floor((n_files - files_scanned) * 1000.0 / n_files) AS BIGINT)
           AS skip_ratio_milli
FROM files CROSS JOIN matched
"""


QUERIES = {
    "compaction_plan": q_compaction_plan,
    "manifest_prune": q_manifest_prune,
}

ORACLES = {
    "compaction_plan": _COMPACTION_SQL,
    "manifest_prune": _PRUNE_SQL,
}
