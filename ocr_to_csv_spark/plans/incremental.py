"""Incremental aggregate maintenance: merge a new batch's partial
aggregates into a persisted state table instead of recomputing over all
history — the only viable shape once the fact table is 100 TB and the
daily delta is 0.1% of it.

Works for any MERGEABLE aggregate: count and sum merge by sum, min/max
by min/max; avg is derived at read time from (sum, count). The merge is
one bounded groupBy over (state ∪ delta-partials) keyed by the group
columns — cost proportional to the STATE size, never to history.

Reference analogue: the reference appends per-run progress totals to its
debug log (main.py:122-133 read-concat-rewrite); this is that idea as a
mergeable-aggregate contract instead of a file concat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the mergeable-aggregate state schema this module maintains:
# keys..., n (count), total (sum), lo (min), hi (max)


def partial_aggregates(df: DataFrame, keys: list[str], val: str) -> DataFrame:
    """Aggregate one batch into mergeable partials."""
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(val).alias("total"),
        F.min(val).alias("lo"),
        F.max(val).alias("hi"),
    )


def merge_aggregates(state: DataFrame, delta_partials: DataFrame, keys: list[str]) -> DataFrame:
    """Merge a batch's partials into the state table: union + one keyed
    groupBy re-combining each mergeable component. New keys appear,
    existing keys update; nothing rescans history."""
    return (
        state.unionByName(delta_partials)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("total").alias("total"),
            F.min("lo").alias("lo"),
            F.max("hi").alias("hi"),
        )
    )
