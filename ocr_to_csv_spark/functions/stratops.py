"""Stratified inference, batch 171: a Simpson's-paradox audit and
fixed-effect meta-analysis with Cochran's Q — the two readouts that
decide whether pooling strata is even legitimate before any of the
engine's aggregate effect estimates (ab_test, diff_in_diff, cuped)
are trusted.

Scale design (100 TB):
- Strata = customer market segments; the 2×2 per stratum (high-value
  flag × promptly-shipped flag over orders×lineitem) is ONE keyed
  aggregate of exact int64 cells; everything downstream is
  strata-bounded.
- ``simpson_paradox``: the association direction per stratum is the
  EXACT integer cross-product sign ad − bc; the audit emits each
  stratum's sign beside the pooled sign and the paradox flag
  (pooled sign disagreeing with every stratum sign) — the aggregation
  trap made a first-class query result.
- ``cochran_q``: per-stratum risk differences pool by inverse-variance
  fixed-effect weights; each stratum's d_i and w_i are leaf-rounded
  to INTEGER nano (w from the exact integer variance numerators), the
  pooled estimate is one division of int64 sums, and Q = Σw(d−D̄)²
  evaluates in fixed-order doubles on the collected strata array,
  9dp. I² = max(0, (Q−df)/Q) milli rides along.

Reference parity: no inference layer in the reference; extends
ab_test, diff_in_diff, cuped, eb_shrinkage, fairness_audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

NANO = 1_000_000_000


def _cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per segment: 2×2 of (high-value order?) × (any line shipped
    within 30 days of order date?)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    c = table(spark, sf_dir, "customer")
    first_ship = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.min("l_shipdate").alias("first_ship")
    )
    j = (
        o.join(first_ship, "o_orderkey")
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_mktsegment").alias("seg"),
            (F.col("o_totalprice") > 150000).cast("long").alias("hv"),
            (
                F.datediff(F.col("first_ship"), F.col("o_orderdate")) <= 30
            ).cast("long").alias("prompt"),
        )
    )
    return j.groupBy("seg").agg(
        F.sum(F.expr("hv * prompt")).cast("long").alias("a"),
        F.sum(F.expr("hv * (1 - prompt)")).cast("long").alias("b"),
        F.sum(F.expr("(1 - hv) * prompt")).cast("long").alias("c"),
        F.sum(F.expr("(1 - hv) * (1 - prompt)")).cast("long").alias("d"),
    )


def q_simpson_paradox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per stratum + pooled (module doc): (seg, a, b, c, d, sign),
    with seg='__POOLED__' carrying the pooled sign and paradox flag."""
    cells = _cells(spark, sf_dir)
    sgn = F.signum(
        (F.col("a") * F.col("d") - F.col("b") * F.col("c")).cast("double")
    ).cast("long")
    per = cells.select(
        "seg", "a", "b", "c", "d", sgn.alias("sign"),
        F.lit(0).cast("long").alias("paradox"),
    )
    pooled = cells.agg(
        F.sum("a").cast("long").alias("a"),
        F.sum("b").cast("long").alias("b"),
        F.sum("c").cast("long").alias("c"),
        F.sum("d").cast("long").alias("d"),
        F.max(
            F.signum(
                (F.col("a") * F.col("d") - F.col("b") * F.col("c")).cast(
                    "double"
                )
            ).cast("long")
        ).alias("max_sign"),
        F.min(
            F.signum(
                (F.col("a") * F.col("d") - F.col("b") * F.col("c")).cast(
                    "double"
                )
            ).cast("long")
        ).alias("min_sign"),
    )
    psgn = F.signum(
        (F.col("a") * F.col("d") - F.col("b") * F.col("c")).cast("double")
    ).cast("long")
    pooled = pooled.select(
        F.lit("__POOLED__").alias("seg"),
        "a", "b", "c", "d",
        psgn.alias("sign"),
        # paradox: pooled sign nonzero and opposite to EVERY stratum
        (
            (psgn != 0)
            & (F.col("max_sign") == F.col("min_sign"))
            & (psgn != F.col("max_sign"))
        ).cast("long").alias("paradox"),
    )
    return per.unionByName(pooled).orderBy("seg")


def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (module doc): (k, pooled_nano, q, i2_milli)."""
    cells = _cells(spark, sf_dir)
    n1 = F.col("a") + F.col("b")
    n0 = F.col("c") + F.col("d")
    # risk difference d = a/n1 − c/n0; variance v = a·b/n1³ + c·d/n0³
    d_nano = F.expr(
        f"CAST(round((CAST(a AS DOUBLE)/(a+b) - CAST(c AS DOUBLE)/(c+d))"
        f" * {NANO}) AS BIGINT)"
    )
    w_nano = F.expr(
        f"CAST(round(1.0 / (CAST(a AS DOUBLE)*b/((a+b)*(a+b)*(a+b))"
        f" + CAST(c AS DOUBLE)*d/((c+d)*(c+d)*(c+d))) ) AS BIGINT)"
    )
    per = cells.select(
        "seg", d_nano.alias("dn"), w_nano.alias("w")
    )
    packed = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.array_sort(F.collect_list(F.struct("seg", "dn", "w"))).alias(
            "gs"
        ),
        F.sum(F.col("w") * F.col("dn")).cast("long").alias("swd"),
        F.sum("w").cast("long").alias("sw"),
    )
    pooled = F.expr("CAST(round(CAST(swd AS DOUBLE) / sw) AS BIGINT)")
    packed = packed.withColumn("pooled_nano", pooled)
    q = F.aggregate(
        F.col("gs"),
        F.lit(0.0),
        lambda acc, g: acc
        + g["w"].cast("double")
        * (
            (g["dn"] - F.col("pooled_nano")).cast("double") / NANO
        )
        * ((g["dn"] - F.col("pooled_nano")).cast("double") / NANO),
    )
    packed = packed.withColumn("q", F.round(q, 9))
    return packed.select(
        "k",
        "pooled_nano",
        "q",
        F.expr(
            "CAST(greatest(floor((q - (k - 1)) / q * 1000), 0) AS BIGINT)"
        ).alias("i2_milli"),
    )


_CELLS_SQL = """
fs AS (
    SELECT l_orderkey AS o_orderkey, min(l_shipdate) AS first_ship
    FROM lineitem GROUP BY l_orderkey
),
j AS (
    SELECT c_mktsegment AS seg,
           (CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)::BIGINT
               AS hv,
           (CASE WHEN datediff('day', o_orderdate, first_ship) <= 30
               THEN 1 ELSE 0 END)::BIGINT AS prompt
    FROM orders
    JOIN fs USING (o_orderkey)
    JOIN customer ON o_custkey = c_custkey
),
cells AS (
    SELECT seg,
           sum(hv * prompt)::BIGINT AS a,
           sum(hv * (1 - prompt))::BIGINT AS b,
           sum((1 - hv) * prompt)::BIGINT AS c,
           sum((1 - hv) * (1 - prompt))::BIGINT AS d
    FROM j GROUP BY seg
)"""

_SIMPSON_SQL = f"""
WITH {_CELLS_SQL}
SELECT seg, a, b, c, d,
       CAST(sign(CAST(a*d - b*c AS DOUBLE)) AS BIGINT) AS sign,
       0::BIGINT AS paradox
FROM cells
UNION ALL
SELECT '__POOLED__', sum(a)::BIGINT, sum(b)::BIGINT, sum(c)::BIGINT,
       sum(d)::BIGINT,
       CAST(sign(CAST(sum(a)*sum(d) - sum(b)*sum(c) AS DOUBLE)) AS BIGINT),
       ((sign(CAST(sum(a)*sum(d) - sum(b)*sum(c) AS DOUBLE)) <> 0)
        AND (max(sign(CAST(a*d - b*c AS DOUBLE)))
             = min(sign(CAST(a*d - b*c AS DOUBLE))))
        AND (sign(CAST(sum(a)*sum(d) - sum(b)*sum(c) AS DOUBLE))
             <> max(sign(CAST(a*d - b*c AS DOUBLE)))))::BIGINT
FROM cells
ORDER BY seg
"""

_COCHRAN_SQL = f"""
WITH {_CELLS_SQL},
per AS (
    SELECT seg,
           CAST(round((CAST(a AS DOUBLE)/(a+b) - CAST(c AS DOUBLE)/(c+d))
               * {NANO}) AS BIGINT) AS dn,
           CAST(round(1.0 / (CAST(a AS DOUBLE)*b/((a+b)*(a+b)*(a+b))
               + CAST(c AS DOUBLE)*d/((c+d)*(c+d)*(c+d)))) AS BIGINT) AS w
    FROM cells
),
packed AS (
    SELECT count(*)::BIGINT AS k,
           list(struct_pack(seg := seg, dn := dn, w := w)
                ORDER BY seg, dn, w) AS gs,
           sum(w * dn)::BIGINT AS swd,
           sum(w)::BIGINT AS sw
    FROM per
),
p2 AS (
    SELECT k, gs,
           CAST(round(CAST(swd AS DOUBLE) / sw) AS BIGINT) AS pooled_nano
    FROM packed
),
p3 AS (
    SELECT k, pooled_nano,
           round(list_reduce(list_prepend([0.0::DOUBLE],
               list_transform(gs, g -> [CAST(g.w AS DOUBLE)
                   * ((g.dn - pooled_nano)::DOUBLE / {NANO})
                   * ((g.dn - pooled_nano)::DOUBLE / {NANO})])),
               (acc, gv) -> [acc[1] + gv[1]])[1], 9) AS q
    FROM p2
)
SELECT k, pooled_nano, q,
       CAST(greatest(floor((q - (k - 1)) / q * 1000), 0) AS BIGINT)
           AS i2_milli
FROM p3
"""

QUERIES = {
    "simpson_paradox": q_simpson_paradox,
    "cochran_q": q_cochran_q,
}

ORACLES = {
    "simpson_paradox": _SIMPSON_SQL,
    "cochran_q": _COCHRAN_SQL,
}
