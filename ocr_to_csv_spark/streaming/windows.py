"""Streaming windowed aggregation (event-time tumbling windows +
watermark) — the stateful-streaming counterpart to the stateless
extraction lift in ``stream.py``.

The extraction pipeline itself needs no cross-document state
(SURVEY.md §2.9), but the run-metrics side (A5/A6: span counts, doc
throughput) is naturally a windowed streaming aggregate when documents
arrive continuously. This module provides that operator over an
event-stream directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_event_counts(
    spark,
    stream_dir: str,
    window: str = "1 day",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming DataFrame: per (tumbling event-time window, event_type)
    count + value sum, tolerating ``watermark`` of lateness. State for
    windows older than the watermark is evicted — the property that lets
    this run forever at 10^12-event scale."""
    e = spark.readStream.schema(EVENTS_SCHEMA).parquet(stream_dir)
    return (
        e.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


def batch_event_counts(spark, events_path: str, window: str = "1 day") -> DataFrame:
    """The batch plan the streaming aggregate must agree with."""
    e = spark.read.parquet(events_path)
    return (
        e.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


def drain_to_memory(df: DataFrame, table_name: str, checkpoint_dir: str):
    """Drain the backlog (availableNow) into an in-memory sink in
    complete mode; returns after the stream finishes."""
    q = (
        df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def session_event_counts(
    spark,
    stream_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming SESSION windows: per-user activity sessions that close
    after ``gap`` of silence (the streaming counterpart of the batch
    ``q_sessionize`` gap/lag formulation, expressed with Spark's native
    ``session_window`` so Catalyst handles the merge-adjacent-windows
    state machine). The watermark bounds session state: a session whose
    end is older than the watermark is finalized and evicted, which is
    what lets per-user session state survive a 10^12-event stream."""
    e = spark.readStream.schema(EVENTS_SCHEMA).parquet(stream_dir)
    return (
        e.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "user_id",
            "n_events",
            "total",
        )
    )


def batch_session_counts(spark, events_path: str, gap: str = "30 minutes") -> DataFrame:
    """The batch session_window plan the streaming version must match."""
    e = spark.read.parquet(events_path)
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "user_id",
            "n_events",
            "total",
        )
    )
