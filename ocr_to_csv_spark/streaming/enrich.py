"""Stream-static enrichment join — the remaining basic streaming join
class (stream-STREAM interval joins live in ``joins.py``): a streaming
event feed joined per micro-batch against a static dimension table.

Scale design: Spark re-plans the static side each micro-batch, so a
small dimension is a BROADCAST hash join against every batch — no
streaming state at all (unlike stream-stream joins, nothing is
retained between batches), which is why this is the default way to
decorate a 10^12-event stream with reference data. The static side
can be swapped for a snapshot-refreshing table without touching the
stream. LEFT OUTER keeps unmatched events (null segment) rather than
dropping them — the usual choice when the dim lags the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import EVENTS_SCHEMA


def _dim(spark, sf_dir: str) -> DataFrame:
    """Static user dimension: customer key → market segment."""
    return spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )


def enriched_events(
    spark, stream_dir: str, sf_dir: str, how: str = "left"
) -> DataFrame:
    """Streaming DataFrame of events decorated with the static user
    dimension (broadcast per micro-batch); ``how`` is 'left' (keep
    unmatched, null segment) or 'inner'."""
    e = spark.readStream.schema(EVENTS_SCHEMA).parquet(stream_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    base = e.select("event_id", "user_id", cents.alias("cents"))
    return base.join(F.broadcast(_dim(spark, sf_dir)), "user_id", how).select(
        "event_id", "user_id", "cents", "segment"
    )


def batch_enriched_events(
    spark, stream_dir: str, sf_dir: str, how: str = "left"
) -> DataFrame:
    """Batch twin over the same files — the equality oracle."""
    e = spark.read.schema(EVENTS_SCHEMA).parquet(stream_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    base = e.select("event_id", "user_id", cents.alias("cents"))
    return base.join(F.broadcast(_dim(spark, sf_dir)), "user_id", how).select(
        "event_id", "user_id", "cents", "segment"
    )
