"""Change detection + ranking bias, batch 131: Merkle-style bucket
digests for diffing two table versions without comparing every row,
and the COEC (click-over-expected-clicks) position-bias readout — the
replication-repair primitive and the ranking-log de-biasing number.

Scale design (100 TB):
- ``merkle_diff``: version 2 is synthesized map-side from orders
  (o_orderkey % 97 == 0 mutated, % 101 == 0 deleted — no extra
  table). Each version collapses to 256 bucket digests in ONE keyed
  aggregate (digest = Σ of 32-bit row hashes — associative,
  partial-aggregated, exact int64 at any tested SF; the 10^12-row
  rewrite keeps the same sum in a modular ring). Only buckets whose
  digests DISAGREE (a 256-row join) are drilled down: the row-level
  full-outer join is confined to the differing buckets' rows by an
  equi-semi-join — at production that is the entire point: repair
  traffic ∝ changed buckets, not table size.
- ``coec_bias``: position priors (clicks/impressions per rank) are a
  5-row keyed aggregate broadcast back; per event type, expected
  clicks = Σ n_{t,p}·prior_p with the prior leaf-floored to INTEGER
  micro-units so the sums are exact int64 (heldout_ppl discipline);
  COEC milli = observed·10⁹ div expected_micro-sum. COEC > 1000 ⟺
  the type out-performs its positions.

Reference parity: no replication/ranking layer in the reference;
extends table_diff/read-audit family with the sub-linear diff and the
eval family (team_draft, auc_roc) with the position de-biasing number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import DUCK_HEX32, hex32, table

MD_BUCKETS = 256
MD_MUT = 97  # o_orderkey % MD_MUT == 0 → value mutated in v2
MD_DEL = 101  # o_orderkey % MD_DEL == 0 → row absent from v2

COEC_POS = 5  # ranks
COEC_THRESH = 50.0  # value ≥ THRESH counts as a click


def _versions(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = table(spark, sf_dir, "orders")
    key = F.col("o_orderkey").cast("long")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    v1 = o.select(key.alias("k"), cents.alias("v"))
    v2 = o.filter(key % MD_DEL != 0).select(
        key.alias("k"),
        F.when(key % MD_MUT == 0, cents + 1).otherwise(cents).alias("v"),
    )
    return v1, v2


def _digests(df: DataFrame) -> DataFrame:
    h = hex32(
        F.concat_ws("|", F.col("k").cast("string"), F.col("v").cast("string"))
    )
    return df.select((F.col("k") % MD_BUCKETS).alias("bucket"), h.alias("h")).groupBy(
        "bucket"
    ).agg(F.sum("h").alias("digest"), F.count(F.lit(1)).alias("n_rows"))


def q_merkle_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differing buckets + drilled-down change counts (module doc)."""
    v1, v2 = _versions(spark, sf_dir)
    d1 = _digests(v1)
    d2 = _digests(v2)
    diff = (
        d1.withColumnRenamed("digest", "dg1").withColumnRenamed("n_rows", "n1")
        .join(
            d2.withColumnRenamed("digest", "dg2").withColumnRenamed(
                "n_rows", "n2"
            ),
            "bucket",
            "full_outer",
        )
        .filter(
            F.coalesce("dg1", F.lit(-1)) != F.coalesce("dg2", F.lit(-1))
        )
    )
    bad = diff.select("bucket")
    r1 = v1.join(
        F.broadcast(bad.withColumnRenamed("bucket", "bkt")),
        F.col("k") % MD_BUCKETS == F.col("bkt"),
        "left_semi",
    )
    r2 = v2.join(
        F.broadcast(bad.withColumnRenamed("bucket", "bkt")),
        F.col("k") % MD_BUCKETS == F.col("bkt"),
        "left_semi",
    )
    drill = (
        r1.withColumnRenamed("v", "v1")
        .join(r2.withColumnRenamed("v", "v2"), "k", "full_outer")
        .select(
            (F.col("k") % MD_BUCKETS).alias("bucket"),
            F.when(
                F.col("v1").isNotNull()
                & F.col("v2").isNotNull()
                & (F.col("v1") != F.col("v2")),
                1,
            ).otherwise(0).alias("chg"),
            F.when(F.col("v2").isNull(), 1).otherwise(0).alias("del_"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("chg").alias("n_changed"),
            F.sum("del_").alias("n_deleted"),
        )
    )
    return (
        diff.join(drill, "bucket", "left")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("dg1").cast("long").alias("v1_digest"),
            F.coalesce("dg2", F.lit(0)).cast("long").alias("v2_digest"),
            F.coalesce("n_changed", F.lit(0)).cast("long").alias("n_changed"),
            F.coalesce("n_deleted", F.lit(0)).cast("long").alias("n_deleted"),
        )
        .orderBy("bucket")
    )


_MD_H = DUCK_HEX32.format(x="k::VARCHAR || '|' || v::VARCHAR")

_MD_SQL = f"""
WITH v1 AS (
    SELECT o_orderkey::BIGINT AS k,
           CAST(round(o_totalprice * 100) AS BIGINT) AS v
    FROM orders
),
v2 AS (
    SELECT o_orderkey::BIGINT AS k,
           CASE WHEN o_orderkey % {MD_MUT} = 0
                THEN CAST(round(o_totalprice * 100) AS BIGINT) + 1
                ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS v
    FROM orders WHERE o_orderkey % {MD_DEL} <> 0
),
d1 AS (
    SELECT k % {MD_BUCKETS} AS bucket, sum({_MD_H})::BIGINT AS dg1,
           count(*)::BIGINT AS n1
    FROM v1 GROUP BY 1
),
d2 AS (
    SELECT k % {MD_BUCKETS} AS bucket, sum({_MD_H})::BIGINT AS dg2,
           count(*)::BIGINT AS n2
    FROM v2 GROUP BY 1
),
diff AS (
    SELECT coalesce(d1.bucket, d2.bucket) AS bucket, dg1, dg2
    FROM d1 FULL OUTER JOIN d2 USING (bucket)
    WHERE coalesce(dg1, -1) <> coalesce(dg2, -1)
),
drill AS (
    SELECT coalesce(a.k, b.k) % {MD_BUCKETS} AS bucket,
           sum(CASE WHEN a.v IS NOT NULL AND b.v IS NOT NULL
                     AND a.v <> b.v THEN 1 ELSE 0 END)::BIGINT AS n_changed,
           sum(CASE WHEN b.v IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_deleted
    FROM (SELECT * FROM v1 WHERE k % {MD_BUCKETS} IN
              (SELECT bucket FROM diff)) a
    FULL OUTER JOIN (SELECT * FROM v2 WHERE k % {MD_BUCKETS} IN
              (SELECT bucket FROM diff)) b USING (k)
    GROUP BY 1
)
SELECT d.bucket::BIGINT AS bucket, d.dg1::BIGINT AS v1_digest,
       coalesce(d.dg2, 0)::BIGINT AS v2_digest,
       coalesce(dr.n_changed, 0)::BIGINT AS n_changed,
       coalesce(dr.n_deleted, 0)::BIGINT AS n_deleted
FROM diff d LEFT JOIN drill dr USING (bucket)
ORDER BY d.bucket
"""


def q_coec_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COEC per event type under the position-prior click model
    (module doc)."""
    e = table(spark, sf_dir, "events")
    imp = e.select(
        F.col("event_type").alias("typ"),
        (F.col("event_id") % COEC_POS + 1).cast("long").alias("pos"),
        (F.col("value") >= COEC_THRESH).cast("long").alias("click"),
    )
    prior = imp.groupBy("pos").agg(
        F.sum("click").alias("c"), F.count(F.lit(1)).alias("n")
    ).select(
        "pos",
        F.floor(F.col("c") * 1_000_000 / F.col("n")).cast("long").alias(
            "prior_micro"
        ),
    )
    per = imp.groupBy("typ", "pos").agg(
        F.sum("click").alias("clicks"), F.count(F.lit(1)).alias("imps")
    )
    j = per.join(F.broadcast(prior), "pos")
    agg = j.groupBy("typ").agg(
        F.sum("clicks").alias("observed"),
        F.sum(F.col("imps") * F.col("prior_micro")).alias("expected_micro"),
    )
    return agg.select(
        "typ",
        F.col("observed").cast("long").alias("observed"),
        F.col("expected_micro").cast("long").alias("expected_micro"),
        F.expr(
            "cast(observed * 1000000000 div expected_micro as bigint)"
        ).alias("coec_milli"),
    ).orderBy("typ")


_COEC_SQL = f"""
WITH imp AS (
    SELECT event_type AS typ,
           (event_id % {COEC_POS} + 1)::BIGINT AS pos,
           (CASE WHEN value >= {COEC_THRESH} THEN 1 ELSE 0 END)::BIGINT
               AS click
    FROM events
),
prior AS (
    SELECT pos,
           CAST(floor(sum(click) * 1000000 / count(*)) AS BIGINT)
               AS prior_micro
    FROM imp GROUP BY pos
),
per AS (
    SELECT typ, pos, sum(click)::BIGINT AS clicks,
           count(*)::BIGINT AS imps
    FROM imp GROUP BY typ, pos
),
agg AS (
    SELECT typ, sum(clicks)::BIGINT AS observed,
           sum(imps * prior_micro)::BIGINT AS expected_micro
    FROM per JOIN prior USING (pos)
    GROUP BY typ
)
SELECT typ, observed, expected_micro,
       (observed * 1000000000 // expected_micro)::BIGINT AS coec_milli
FROM agg
ORDER BY typ
"""


QUERIES = {
    "merkle_diff": q_merkle_diff,
    "coec_bias": q_coec_bias,
}

ORACLES = {
    "merkle_diff": _MD_SQL,
    "coec_bias": _COEC_SQL,
}
