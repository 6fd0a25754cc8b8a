"""Compression transforms, batch 143: Burrows–Wheeler transform with
run-length readout, and move-to-front coding — the bzip2 pipeline
(BWT → MTF → RLE) as bounded in-row expressions, measuring how much
context clustering the transform actually buys on corpus text.

Scale design (100 TB):
- Probe docs only (doc_id % 50 == 0) and the first BWT_LEN=64 chars:
  the transforms are O(n²)/O(n·|Σ|) per document and exist to AUDIT
  compressibility (the dict_compress_est/compress_ratio family), not
  to compress the corpus — a sampled audit slice is the production
  shape. Everything is map-side expression work; no shuffle at all
  beyond the scan.
- ``bwt_rle``: all n rotations are built by one transform (two
  substrings each), sorted in-row (array_sort; equal rotations give
  equal last chars so ties cannot break determinism), the BWT string
  is the concatenated last column, and the run counts of original vs
  BWT text are one pass each — the clustering win (runs_bwt ≤
  runs_orig on average) is pinned in the test.
- ``mtf_encode``: one sequential fold over the char codes with the
  alphabet riding INSIDE the accumulator ([cost, n_small, alphabet…]
  — the DGIM packed-state discipline): j = position of the char,
  cost += j−1, alphabet reordered by concat([c], remove(c)). Run on
  both the raw text and its BWT; BWT-then-MTF concentrating mass on
  small codes is the bzip2 effect the audit quantifies.

Reference parity: no compression layer in the reference; extends
compress_ratio, dict_compress_est, cdc_chunks, rle_events, and the
stringology batch (suffix_rank — the BWT is the suffix array's last
column).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

BWT_LEN = 64
PROBE_MOD = 50


def _probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") % PROBE_MOD == 0).select(
        "doc_id", F.substring(F.col("text"), 1, BWT_LEN).alias("s")
    )


def _bwt(s: Column) -> Column:
    n = F.length(s)
    rots = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(s.substr(i, n - i + 1), s.substr(F.lit(1), i - 1)),
    )
    return F.array_join(
        F.transform(F.array_sort(rots), lambda r: r.substr(n, F.lit(1))),
        "",
    )


def _runs(s: Column) -> Column:
    n = F.length(s)
    agg = F.lit(1).cast("long") + F.aggregate(
        F.sequence(F.lit(2), n),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + (s.substr(i, F.lit(1)) != s.substr(i - 1, F.lit(1))).cast("long"),
    )
    # Spark's sequence(2, 1) counts DOWN — guard single-char strings
    return F.when(n >= 2, agg).otherwise(n.cast("long"))


def q_bwt_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per probe doc (module doc): (doc_id, n, runs_orig, runs_bwt,
    bwt_head)."""
    p = _probe(spark, sf_dir)
    s = F.col("s")
    bwt = _bwt(s)
    return p.select(
        "doc_id",
        F.length(s).cast("long").alias("n"),
        _runs(s).alias("runs_orig"),
        _runs(bwt).alias("runs_bwt"),
        F.substring(bwt, 1, 16).alias("bwt_head"),
    ).orderBy("doc_id")


def _mtf(s: Column) -> tuple[Column, Column]:
    """(total cost Σ(j−1), count of j ≤ 2) of move-to-front over the
    char codes of s."""
    n = F.length(s)
    chars = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.ascii(s.substr(i, F.lit(1))).cast("long"),
    )
    alph0 = F.array_sort(F.array_distinct(chars))
    init = F.concat(
        F.array(F.lit(0).cast("long"), F.lit(0).cast("long")), alph0
    )

    def step(acc, c):
        alph = F.slice(acc, 3, F.size(acc) - 2)
        j = F.array_position(alph, c)
        return F.concat(
            F.array(
                F.element_at(acc, 1) + j - 1,
                F.element_at(acc, 2) + (j <= 2).cast("long"),
                c,
            ),
            F.filter(alph, lambda x: x != c),
        )

    fin = F.aggregate(chars, init, step)
    return F.element_at(fin, 1), F.element_at(fin, 2)


def q_mtf_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MTF cost on raw text vs on its BWT per probe doc (module doc):
    (doc_id, n, cost_raw, small_raw, cost_bwt, small_bwt)."""
    p = _probe(spark, sf_dir)
    s = F.col("s")
    cr, sr = _mtf(s)
    p2 = p.select("doc_id", s.alias("s"), _bwt(s).alias("b"))
    cb, sb = _mtf(F.col("b"))
    return p2.select(
        "doc_id",
        F.length("s").cast("long").alias("n"),
        cr.alias("cost_raw"),
        sr.alias("small_raw"),
        cb.alias("cost_bwt"),
        sb.alias("small_bwt"),
    ).orderBy("doc_id")


_PROBE_SQL = f"""
p AS (
    SELECT doc_id, substr(text, 1, {BWT_LEN}) AS s
    FROM documents WHERE doc_id % {PROBE_MOD} = 0
)"""

_BWT = (
    "array_to_string(list_transform(list_sort("
    "list_transform(generate_series(1, length({s})), "
    "i -> substr({s}, i, length({s}) - i + 1) || substr({s}, 1, i - 1))), "
    "r -> substr(r, length({s}), 1)), '')"
)

_RUNS = (
    "(1 + coalesce(list_sum(list_transform(generate_series(2, length({s})), "
    "i -> CASE WHEN substr({s}, i, 1) <> substr({s}, i - 1, 1) "
    "THEN 1 ELSE 0 END)), 0))::BIGINT"
)

_BWT_SQL = f"""
WITH {_PROBE_SQL},
b AS (SELECT doc_id, s, {_BWT.format(s='s')} AS bwt FROM p)
SELECT doc_id, length(s)::BIGINT AS n,
       {_RUNS.format(s='s')} AS runs_orig,
       {_RUNS.format(s='bwt')} AS runs_bwt,
       substr(bwt, 1, 16) AS bwt_head
FROM b
ORDER BY doc_id
"""

_MTF_STEP = (
    "list_concat([acc[1] + list_position(list_slice(acc, 3, len(acc)), cv[1])"
    " - 1, acc[2] + (CASE WHEN list_position(list_slice(acc, 3, len(acc)),"
    " cv[1]) <= 2 THEN 1 ELSE 0 END), cv[1]], "
    "list_filter(list_slice(acc, 3, len(acc)), x -> x <> cv[1]))"
)

_MTF = (
    "list_reduce(list_prepend("
    "list_concat([0::BIGINT, 0::BIGINT], "
    "list_sort(list_distinct(list_transform(generate_series(1, length({s})), "
    "i -> ascii(substr({s}, i, 1))::BIGINT)))), "
    "list_transform(generate_series(1, length({s})), "
    "i -> [ascii(substr({s}, i, 1))::BIGINT])), "
    f"(acc, cv) -> {_MTF_STEP})"
)

_MTF_SQL = f"""
WITH {_PROBE_SQL},
b AS (SELECT doc_id, s, {_BWT.format(s='s')} AS bwt FROM p),
m AS (SELECT doc_id, s,
             {_MTF.format(s='s')} AS mr,
             {_MTF.format(s='bwt')} AS mb
      FROM b)
SELECT doc_id, length(s)::BIGINT AS n,
       mr[1]::BIGINT AS cost_raw, mr[2]::BIGINT AS small_raw,
       mb[1]::BIGINT AS cost_bwt, mb[2]::BIGINT AS small_bwt
FROM m
ORDER BY doc_id
"""

QUERIES = {
    "bwt_rle": q_bwt_rle,
    "mtf_encode": q_mtf_encode,
}

ORACLES = {
    "bwt_rle": _BWT_SQL,
    "mtf_encode": _MTF_SQL,
}
