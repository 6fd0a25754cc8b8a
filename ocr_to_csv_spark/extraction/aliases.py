"""Alias-dictionary lifecycle (reference S4/S7/O4).

The reference bootstraps ``aliases.json`` on first run (main.py:72-81),
grows it when a human confirms a novel name (main.py:219-228), and
persists it sorted "for optimization" (main.py:280-286). A cluster
pipeline can't block on a human (SURVEY.md §2.11), so the rebuild's
flow is:

1. extraction flags low-confidence / unmatched cells ``accepted=false``
   → they land in the review sink (``review_queue``);
2. an offline review process (human or model) emits confirmed values;
3. ``merge_aliases`` upserts them into the dictionary — the batch
   analogue of Iceberg ``MERGE INTO`` — and the next run broadcasts the
   grown dictionary.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ALIAS_SCHEMA = "col int, value string"


def bootstrap_aliases(spark: SparkSession, path: str) -> DataFrame:
    """S4: load the alias table, creating the empty skeleton when missing
    (reference main.py:72-81 creates ``{"names": {"1": [], "5": []}}``)."""
    if os.path.exists(path):
        return spark.read.parquet(path)
    return spark.createDataFrame([], ALIAS_SCHEMA)


def review_queue(rows_like: DataFrame) -> DataFrame:
    """Cells the reference would have asked a human about: the rebuild's
    review sink (SURVEY.md §2.11 'flag + review table')."""
    return rows_like.filter(~F.col("accepted")).select(
        "doc_id", "offset", "media_ref", "row", "col", "text", "prob"
    )


def merge_aliases(aliases: DataFrame, confirmed: DataFrame) -> DataFrame:
    """S7: upsert confirmed ``(col, value)`` pairs into the dictionary.

    Values are lowercased (the dictionary stores lowercase, reference
    corrections.py:187-204 compares case-folded) and deduplicated —
    semantically ``MERGE INTO aliases USING confirmed ON col/value WHEN
    NOT MATCHED THEN INSERT``. Only dictionary-backed columns (1 = names,
    5 = purposes) are accepted."""
    new = (
        confirmed.filter(F.col("col").isin(1, 5))
        .select(F.col("col").cast("int"), F.lower(F.col("value")).alias("value"))
        .filter((F.col("value").isNotNull()) & (F.col("value") != ""))
    )
    return aliases.select("col", "value").unionByName(new).distinct()


def write_aliases(aliases: DataFrame, path: str) -> None:
    """O4: persist sorted (reference main.py:281-282 sorts before dump)."""
    aliases.orderBy("col", "value").coalesce(1).write.mode("overwrite").parquet(
        path
    )
