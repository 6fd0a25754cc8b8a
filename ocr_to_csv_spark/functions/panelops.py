"""Panel econometrics + cache theory, batch 154: the fixed-effects
(within) estimator over a customer panel, and Mattson's stack-distance
algorithm giving LRU hit ratios for EVERY cache size in one pass — the
workhorse panel regression next to ols_fit/diff_in_diff (which can't
absorb entity heterogeneity) and the storage-tier sizing curve.

Scale design (100 TB):
- ``fe_within``: per-entity moments (n_i, Σx, Σy, Σxy, Σx²) are ONE
  keyed aggregate, all exact int64 (cents/quantities). The within
  transform clears each entity's demeaned cross-moment to the exact
  rational (n_i·Σxy − Σx·Σy)/n_i; each entity's numerator and
  denominator terms are leaf-rounded to INTEGER nano BEFORE the
  entity-scale sums (the heldout_ppl discipline), so the final slope
  is one division over two exact int64 sums. The pooled-OLS slope is
  emitted beside it — the within-vs-pooled gap IS the fixed-effect
  evidence the test pins.
- ``lru_stack``: within each supplier's chronological part-access
  stream, the LRU stack distance of an access is its MTF list
  position (Mattson 1970) — ONE in-row fold per supplier carrying the
  recency list (the mtf_encode device), emitting hit counts for ALL
  cache sizes C ∈ {1,2,4,8} simultaneously (a hit at C ⇔ distance ≤
  C). One aggregate over suppliers yields the fleet-wide hit-ratio
  curve — the miss-curve every cache-sizing decision reads.

Reference parity: no econometrics/cache layer in the reference;
extends ols_fit, diff_in_diff, cuped (panel family) and mtf_encode,
sliding_distinct (recency family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

NANO = 1_000_000_000
FE_SCALE = 1_000  # fe_within within-moment scale: nano overflowed int64 sums at sf0.1 (r4)
LRU_SIZES = (1, 2, 4, 8)


def q_fe_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (module doc): entity-demeaned (within) slope of order
    total price (cents) on order-line count, vs the pooled slope:
    (n_entities, n_obs, slope_within, slope_pooled)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    nlines = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    obs = o.join(nlines, "o_orderkey").select(
        F.col("o_custkey").alias("ent"),
        F.col("x"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    per = obs.groupBy("ent").agg(
        F.count(F.lit(1)).cast("long").alias("ni"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    # per-entity demeaned moments as nano-rounded rationals
    num_i = F.expr(
        f"CAST(round(CAST(ni * sxy - sx * sy AS DOUBLE) / ni * {FE_SCALE}) "
        "AS BIGINT)"
    )
    den_i = F.expr(
        f"CAST(round(CAST(ni * sxx - sx * sx AS DOUBLE) / ni * {FE_SCALE}) "
        "AS BIGINT)"
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_entities"),
        F.sum("ni").cast("long").alias("n_obs"),
        F.sum(num_i).cast("long").alias("wnum"),
        F.sum(den_i).cast("long").alias("wden"),
        F.sum("sx").cast("long").alias("tx"),
        F.sum("sy").cast("long").alias("ty"),
        F.sum("sxy").cast("long").alias("txy"),
        F.sum("sxx").cast("long").alias("txx"),
    )
    return agg.select(
        "n_entities",
        "n_obs",
        F.round(
            F.col("wnum").cast("double") / F.col("wden"), 9
        ).alias("slope_within"),
        F.round(
            (
                F.col("n_obs").cast("double") * F.col("txy")
                - F.col("tx").cast("double") * F.col("ty")
            )
            / (
                F.col("n_obs").cast("double") * F.col("txx")
                - F.col("tx").cast("double") * F.col("tx")
            ),
            9,
        ).alias("slope_pooled"),
    )


def q_lru_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleet-wide LRU hit counts at all LRU_SIZES from one Mattson
    pass per supplier (module doc): (n_accesses, n_streams,
    hits_1, hits_2, hits_4, hits_8)."""
    li = table(spark, sf_dir, "lineitem")
    streams = li.groupBy(F.col("l_suppkey").alias("supp")).agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct("l_orderkey", "l_linenumber", "l_partkey")
                )
            ),
            lambda s: s["l_partkey"].cast("long"),
        ).alias("parts"),
    )
    # acc = [h1, h2, h4, h8, recency list...]
    nsz = len(LRU_SIZES)
    init = F.array(*[F.lit(0).cast("long") for _ in range(nsz)])

    def step(acc, p):
        rec = F.slice(acc, nsz + 1, F.size(acc) - nsz)
        pos = F.array_position(rec, p)  # 0 = cold miss
        hits = [
            F.element_at(acc, k + 1)
            + ((pos > 0) & (pos <= LRU_SIZES[k])).cast("long")
            for k in range(nsz)
        ]
        newrec = F.concat(
            F.array(p), F.filter(rec, lambda x: x != p)
        )
        return F.concat(F.array(*hits), newrec)

    fin = F.aggregate(F.col("parts"), init, step)
    per = streams.select(
        F.size("parts").cast("long").alias("n_acc"),
        *[
            F.element_at(fin, k + 1).alias(f"h{LRU_SIZES[k]}")
            for k in range(nsz)
        ],
    )
    return per.agg(
        F.sum("n_acc").cast("long").alias("n_accesses"),
        F.count(F.lit(1)).cast("long").alias("n_streams"),
        *[
            F.sum(f"h{c}").cast("long").alias(f"hits_{c}")
            for c in LRU_SIZES
        ],
    )


_FE_SQL = f"""
WITH nlines AS (
    SELECT l_orderkey AS o_orderkey, count(*)::BIGINT AS x
    FROM lineitem GROUP BY l_orderkey
),
obs AS (
    SELECT o_custkey AS ent, x,
           CAST(round(o_totalprice * 100) AS BIGINT) AS y
    FROM orders JOIN nlines USING (o_orderkey)
),
per AS (
    SELECT ent, count(*)::BIGINT AS ni,
           sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
           sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx
    FROM obs GROUP BY ent
),
agg AS (
    SELECT count(*)::BIGINT AS n_entities,
           sum(ni)::BIGINT AS n_obs,
           sum(CAST(round(CAST(ni * sxy - sx * sy AS DOUBLE) / ni
               * {FE_SCALE}) AS BIGINT))::BIGINT AS wnum,
           sum(CAST(round(CAST(ni * sxx - sx * sx AS DOUBLE) / ni
               * {FE_SCALE}) AS BIGINT))::BIGINT AS wden,
           sum(sx)::BIGINT AS tx, sum(sy)::BIGINT AS ty,
           sum(sxy)::BIGINT AS txy, sum(sxx)::BIGINT AS txx
    FROM per
)
SELECT n_entities, n_obs,
       round(CAST(wnum AS DOUBLE) / wden, 9) AS slope_within,
       round((CAST(n_obs AS DOUBLE) * txy - CAST(tx AS DOUBLE) * ty)
           / (CAST(n_obs AS DOUBLE) * txx - CAST(tx AS DOUBLE) * tx), 9)
           AS slope_pooled
FROM agg
"""


def _lru_sql() -> str:
    nsz = len(LRU_SIZES)
    hits = ", ".join(
        f"CASE WHEN list_position(list_slice(acc, {nsz + 1}, len(acc)), "
        f"pv[1]) > 0 AND list_position(list_slice(acc, {nsz + 1}, "
        f"len(acc)), pv[1]) <= {LRU_SIZES[k]} THEN acc[{k + 1}] + 1 "
        f"ELSE acc[{k + 1}] END"
        for k in range(nsz)
    )
    step = (
        f"list_concat(list_concat([{hits}], [pv[1]]), "
        f"list_filter(list_slice(acc, {nsz + 1}, len(acc)), "
        f"x -> x <> pv[1]))"
    )
    init = "[" + ", ".join("0::BIGINT" for _ in range(nsz)) + "]"
    hsel = ", ".join(
        f"sum(fin[{k + 1}])::BIGINT AS hits_{LRU_SIZES[k]}"
        for k in range(nsz)
    )
    return f"""
WITH streams AS (
    SELECT l_suppkey AS supp,
           list_transform(
               list(struct_pack(o := l_orderkey, l := l_linenumber,
                                p := l_partkey)
                    ORDER BY l_orderkey, l_linenumber, l_partkey),
               s -> s.p::BIGINT) AS parts
    FROM lineitem GROUP BY l_suppkey
),
folded AS (
    SELECT supp, len(parts)::BIGINT AS n_acc,
           list_reduce(
               list_prepend({init},
                   list_transform(parts, p -> [p])),
               (acc, pv) -> {step}) AS fin
    FROM streams
)
SELECT sum(n_acc)::BIGINT AS n_accesses,
       count(*)::BIGINT AS n_streams,
       {hsel}
FROM folded
"""


QUERIES = {
    "fe_within": q_fe_within,
    "lru_stack": q_lru_stack,
}

ORACLES = {
    "fe_within": _FE_SQL,
    "lru_stack": _lru_sql(),
}
