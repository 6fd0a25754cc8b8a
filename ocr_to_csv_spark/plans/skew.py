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


def salted_join(
    big: DataFrame, small: DataFrame, on: list[str], n_salts: int = 16
) -> DataFrame:
    """Hot-key-safe equi-join: the big side gets a salt column, the
    small side is replicated once per salt value, and the join runs on
    (keys..., salt) — a key holding 20% of the big table spreads over
    ``n_salts`` reducers instead of melting one. For a dim small enough
    to broadcast, broadcast instead (no shuffle at all); salting is for
    the case where BOTH sides exceed broadcast size and the key
    histogram is skewed (AQE's skew-join split handles sort-merge
    plans; explicit salting also covers hash-partitioned storage joins
    and pre-AQE engines). Join semantics are exactly the plain join —
    each big-side row meets each matching small-side row exactly once,
    in the one partition its salt selects."""
    b = big.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, on + ["_salt"]).drop("_salt")
