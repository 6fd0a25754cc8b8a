"""Stream-stream time-interval join — the streaming twin of the batch
``relational.q_interval_join``: every error event opens a 10-minute
window; click events landing inside any open window join to it.

Same bucketization trick as the batch op: the interval side explodes
into its ≤2 coarse time buckets and the point side carries one, so the
join state is hash-partitioned on an EQUI key (the bucket) and the
range predicate only refines matches within a bucket — Spark's
stream-stream join keeps per-key state, and the watermark + time
constraint bound how long click/error rows are retained (state is
evicted once the other side can no longer produce a match), which is
what lets this run forever. Without the equi key the join would be a
stateful cartesian against all retained rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import EVENTS_SCHEMA

IVL_WIN = 600  # seconds, == bucket width (explode factor ≤ 2)


def interval_click_join(
    spark, stream_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming DataFrame of (ivl_id, click_id, cents) pairs: clicks
    inside [error_ts, error_ts + IVL_WIN)."""
    e = spark.readStream.schema(EVENTS_SCHEMA).parquet(stream_dir)
    sec = F.unix_timestamp("ts").cast("long")
    errors = (
        e.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("ivl_id"),
            F.col("ts").alias("err_ts"),
            sec.alias("lo"),
        )
        .withWatermark("err_ts", watermark)
        .select(
            "*",
            F.explode(
                F.sequence(
                    F.expr(f"lo div {IVL_WIN}"),
                    F.expr(f"(lo + {IVL_WIN}) div {IVL_WIN}"),
                )
            ).alias("eb"),
        )
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            sec.alias("p"),
            F.expr(f"cast(unix_timestamp(ts) as long) div {IVL_WIN}").alias("cb"),
        )
        .withWatermark("click_ts", watermark)
    )
    # a click carries exactly ONE bucket, so each (ivl, click) pair can
    # match in at most one bucket — no dedup needed after the join
    joined = errors.join(
        clicks,
        F.expr(
            f"""
            eb = cb
            AND p >= lo AND p < lo + {IVL_WIN}
            AND click_ts >= err_ts - interval 1 second
            AND click_ts <= err_ts + interval {IVL_WIN + 1} seconds
            """
        ),
    )
    return joined.select("ivl_id", "click_id", "cents")


def batch_interval_pairs(spark, events_path: str) -> DataFrame:
    """The batch pairs the streaming join must agree with."""
    e = spark.read.parquet(events_path)
    sec = F.unix_timestamp("ts").cast("long")
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("ivl_id"), sec.alias("lo")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        sec.alias("p"),
    )
    return (
        errors.join(
            clicks,
            (F.col("p") >= F.col("lo")) & (F.col("p") < F.col("lo") + IVL_WIN),
        )
        .select("ivl_id", "click_id", "cents")
        .distinct()
    )


def drain_append_to_memory(df: DataFrame, table_name: str, checkpoint_dir: str):
    """Drain the backlog (availableNow) into an in-memory sink in APPEND
    mode (stream-stream joins emit append-only); returns when done."""
    q = (
        df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
