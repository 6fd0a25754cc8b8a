"""Sketch family completion, batch 170: the Count-Sketch (Charikar–
Chen–Farach-Colton — signed counters with a MEDIAN estimate, the
unbiased sibling of count-min's biased minimum) and an empirical
universality audit of the affine hash family every sketch here hashes
with — the "is 1/m collision probability actually delivered" check.

Scale design (100 TB):
- ``count_sketch``: the token stream explodes ×J=5 rows and builds
  the (row, bucket) signed-sum table with ONE keyed aggregate —
  commutative int64, shuffle-safe like the Bloom build. Probe terms
  (5 heavy + 5 rare literals) fetch their J cells by equi-join and
  take the exact integer MEDIAN of the 5 signed reads (sorted-array
  middle — no floats); audited against exact counts. Median-of-signs
  is what makes the estimator unbiased under cancellation — the
  property the count-min family can't offer.
- ``hash_family_audit``: K=16 affine functions h(x) = ((a·x+b) mod p)
  mod m over the customer keys; per function the collision mass
  Σ_b C(n_b, 2) is ONE keyed count + one aggregate, and the
  universality ratio 2·coll·m / (n(n−1)) in exact milli should sit
  near 1000 — pinned in a band across the family (pairwise
  independence delivered, not assumed).

Reference parity: no sketch layer in the reference; completes
cms_freq (min) / ams_f2 (sign-sums) / fm_sketch (bitmaps) /
hll_distinct (loglog) with the median-of-signs tier.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import DUCK_HEX32, hex32, table, tokens

CS_J = 5
CS_W = 256
HF_K = 16
HF_P = 2147483647  # 2^31 - 1
HF_M = 64


def _h(tag: str) -> int:
    return int(hashlib.md5(tag.encode()).hexdigest()[:8], 16)


HF_AB = [
    (_h(f"hfa|{k}") % (HF_P - 1) + 1, _h(f"hfb|{k}") % HF_P)
    for k in range(HF_K)
]
CS_PROBES = (
    "join", "hash", "row", "batch", "scan",  # heavy
    "zebra", "quokka", "lemur", "okapi", "numbat",  # rare/absent
)


def q_count_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per probe term (module doc): (term, exact, est, abs_err)."""
    d = table(spark, sf_dir, "documents", spread=True)
    toks = d.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("t")
    )
    rows = []
    for j in range(CS_J):
        b = hex32(F.concat(F.lit(f"csb{j}|"), F.col("t"))) % CS_W
        sg = (
            hex32(F.concat(F.lit(f"css{j}|"), F.col("t"))) % 2
        ) * 2 - 1
        rows.append(
            toks.select(
                F.lit(j).alias("j"), b.alias("b"), sg.alias("sg")
            )
        )
    allrows = rows[0]
    for r in rows[1:]:
        allrows = allrows.unionByName(r)
    cells = allrows.groupBy("j", "b").agg(
        F.sum("sg").cast("long").alias("c")
    )
    probes = []
    for term in CS_PROBES:
        for j in range(CS_J):
            probes.append(
                (
                    term,
                    j,
                    _h(f"csb{j}|{term}") % CS_W,
                    (_h(f"css{j}|{term}") % 2) * 2 - 1,
                )
            )
    pr = spark.createDataFrame(
        probes, "term string, j long, b long, psg long"
    )
    reads = (
        pr.join(cells, ["j", "b"], "left")
        .select(
            "term",
            (F.col("psg") * F.coalesce(F.col("c"), F.lit(0))).alias("r"),
        )
        .groupBy("term")
        .agg(F.array_sort(F.collect_list("r")).alias("rs"))
        .select(
            "term",
            F.element_at(F.col("rs"), CS_J // 2 + 1).alias("est"),
        )
    )
    exact = toks.groupBy(F.col("t").alias("term")).agg(
        F.count(F.lit(1)).cast("long").alias("exact")
    )
    pterms = spark.createDataFrame(
        [(t,) for t in CS_PROBES], "term string"
    )
    return (
        pterms.join(exact, "term", "left")
        .join(reads, "term")
        .select(
            "term",
            F.coalesce("exact", F.lit(0)).cast("long").alias("exact"),
            F.col("est").cast("long").alias("est"),
            F.abs(
                F.coalesce("exact", F.lit(0)) - F.col("est")
            ).cast("long").alias("abs_err"),
        )
        .orderBy("term")
    )


def q_hash_family_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per hash function (module doc): (fn_id, n, m, coll_pairs,
    ratio_milli)."""
    c = table(spark, sf_dir, "customer")
    keys = c.select(F.col("c_custkey").cast("long").alias("x"))
    n = keys.count()
    outs = []
    for k, (a, b) in enumerate(HF_AB):
        bucket = ((F.col("x") * a + b) % HF_P) % HF_M
        loads = keys.groupBy(bucket.alias("bk")).agg(
            F.count(F.lit(1)).cast("long").alias("nb")
        )
        coll = loads.agg(
            F.sum(F.expr("nb * (nb - 1) div 2"))
            .cast("long")
            .alias("coll_pairs")
        )
        outs.append(
            coll.select(
                F.lit(k).cast("long").alias("fn_id"),
                F.lit(n).cast("long").alias("n"),
                F.lit(HF_M).cast("long").alias("m"),
                "coll_pairs",
                F.expr(
                    f"(2000 * coll_pairs * {HF_M}) div "
                    f"({n}L * {n - 1}L)"
                ).alias("ratio_milli"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("fn_id")


def _cs_sql() -> str:
    toks = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
    branches = " UNION ALL ".join(
        f"SELECT {j} AS j, "
        f"({DUCK_HEX32.format(x=f(chr(39) + f'csb{j}|' + chr(39)))}) % {CS_W} AS b, "
        f"(({DUCK_HEX32.format(x=f(chr(39) + f'css{j}|' + chr(39)))}) % 2) * 2 - 1 AS sg "
        f"FROM tk"
        for j in range(CS_J)
        for f in [lambda p: p + " || t"]
    )
    probe_rows = ", ".join(
        f"('{term}', {j}, {_h(f'csb{j}|{term}') % CS_W}, "
        f"{(_h(f'css{j}|{term}') % 2) * 2 - 1})"
        for term in CS_PROBES
        for j in range(CS_J)
    )
    pterms = ", ".join(f"('{t}')" for t in CS_PROBES)
    return f"""
WITH tk AS (
    SELECT unnest({toks}) AS t FROM documents
),
allrows AS ({branches}),
cells AS (SELECT j, b, sum(sg)::BIGINT AS c FROM allrows GROUP BY j, b),
pr(term, j, b, psg) AS (VALUES {probe_rows}),
reads AS (
    SELECT term,
           (list_sort(list(psg * coalesce(c, 0))))[{CS_J // 2 + 1}]
               ::BIGINT AS est
    FROM pr LEFT JOIN cells USING (j, b)
    GROUP BY term
),
exact AS (SELECT t AS term, count(*)::BIGINT AS exact FROM tk GROUP BY t),
pterms(term) AS (VALUES {pterms})
SELECT pterms.term, coalesce(exact, 0)::BIGINT AS exact, est,
       abs(coalesce(exact, 0) - est)::BIGINT AS abs_err
FROM pterms
LEFT JOIN exact ON exact.term = pterms.term
JOIN reads ON reads.term = pterms.term
ORDER BY pterms.term
"""


def _hf_sql() -> str:
    sels = []
    for k, (a, b) in enumerate(HF_AB):
        sels.append(
            f"""SELECT {k}::BIGINT AS fn_id, nn.n, {HF_M}::BIGINT AS m,
        cp.coll_pairs,
        ((2000 * cp.coll_pairs * {HF_M}) // (nn.n * (nn.n - 1)))::BIGINT
            AS ratio_milli
    FROM (SELECT sum(nb * (nb - 1) // 2)::BIGINT AS coll_pairs FROM (
        SELECT ((c_custkey * {a} + {b}) % {HF_P}) % {HF_M} AS bk,
               count(*)::BIGINT AS nb
        FROM customer GROUP BY 1)) cp,
        (SELECT count(*)::BIGINT AS n FROM customer) nn"""
        )
    return "\nUNION ALL\n".join(sels) + "\nORDER BY fn_id"


QUERIES = {
    "count_sketch": q_count_sketch,
    "hash_family_audit": q_hash_family_audit,
}

ORACLES = {
    "count_sketch": _cs_sql(),
    "hash_family_audit": _hf_sql(),
}
