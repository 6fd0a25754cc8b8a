"""Skew handling: two-phase salted aggregation (SURVEY.md §4.3a).

A single hot key (mega-document, viral token) lands its entire group in
one reducer. Salting splits each group across ``n_salts`` reducers for
the partial phase, then the final phase combines the per-salt partials —
correct for any decomposable aggregate. AQE's skew-join splitting covers
joins; this covers aggregations, and is the same pattern the extraction
pipeline uses positionally (salt = the (offset, row) component of its
repartition keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    keys: list[str],
    sum_col: str | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase count(+sum) per key group via an explicit random salt.

    Phase 1 groups on (keys..., salt) — a hot key spreads over
    ``n_salts`` tasks; phase 2 sums the partials on the true keys.
    Returns columns: keys..., n [, total].
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.rand(seed=42) * n_salts), F.lit(n_salts))
    )
    partial_aggs = [F.count("*").alias("_pn")]
    if sum_col is not None:
        partial_aggs.append(F.sum(sum_col).alias("_ps"))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    final_aggs = [F.sum("_pn").alias("n")]
    if sum_col is not None:
        final_aggs.append(F.sum("_ps").alias("total"))
    return partial.groupBy(*keys).agg(*final_aggs)
