"""Stringology III, batch 167: the Z-array (prefix-match table) of
probe documents and Z-based pattern counting — the third classic
string index next to suffix_rank/bwt_rle/fm_count, with the
match-count identity (z_i ≥ |P| over P#s ⇔ an occurrence) as its own
verification.

Scale design (100 TB):
- Probe-doc slices only (the bwt_rle audit discipline); Z values are
  computed by the DIRECT definition z_i = LCP(s, s[i:]) as a bounded
  in-row double loop (O(n²) confined to the 64-char probe slice —
  the smith_waterman confinement argument; the O(n) two-pointer
  algorithm is a driver-side optimization the audit doesn't need).
- ``z_array``: per probe doc, the maximum Z value (longest internal
  repeat of the document's opening) and the count of positions with
  z ≥ 4 — the self-similarity profile.
- ``z_count``: the Z-array of P + sentinel + s counts occurrences of
  P as positions with z ≥ |P|; equality with the direct substring
  count is emitted per doc and pinned — two independent counting
  mechanisms agreeing.

Reference parity: no stringology layer in the reference; extends
suffix_rank/longest_repeat, fm_count, bwt_rle, multi_pattern_scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .bwtops import BWT_LEN, PROBE_MOD
from .util import table

Z_PAT = "tab"
SENT2 = "\x02"


def _zvals(s: Column, nmax: int) -> Column:
    """Z-array by direct LCP: z[i] (i = 2..n, 1-based) as an array;
    z[1] := n by convention."""
    n = F.length(s)

    def lcp_at(i):
        # length of common prefix of s and s[i:]
        lim = n - i + 1
        mism = F.filter(
            F.sequence(F.lit(1), F.lit(nmax)),
            lambda k: (k <= lim)
            & (
                s.substr(k, F.lit(1))
                != s.substr(i + k - 1, F.lit(1))
            ),
        )
        return F.coalesce(
            F.array_min(mism) - 1, F.least(lim.cast("long"), F.lit(nmax))
        )

    return F.concat(
        F.array(n.cast("long")),
        F.transform(
            F.sequence(F.lit(2), n), lambda i: lcp_at(i).cast("long")
        ),
    )


def q_z_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per probe doc (module doc): (doc_id, n, max_z, n_z_ge4)."""
    d = table(spark, sf_dir, "documents")
    p = d.filter(F.col("doc_id") % PROBE_MOD == 0).select(
        "doc_id", F.substring(F.col("text"), 1, BWT_LEN).alias("s")
    )
    z = _zvals(F.col("s"), BWT_LEN)
    inner = F.slice(z, 2, F.greatest(F.size(z) - 1, F.lit(0)))
    return p.select(
        "doc_id",
        F.length("s").cast("long").alias("n"),
        F.coalesce(F.array_max(inner), F.lit(0)).cast("long").alias(
            "max_z"
        ),
        F.size(F.filter(inner, lambda x: x >= 4)).cast("long").alias(
            "n_z_ge4"
        ),
    ).orderBy("doc_id")


def q_z_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-based occurrence count of Z_PAT per probe doc (module doc):
    (doc_id, n, z_count, direct_count, ok)."""
    d = table(spark, sf_dir, "documents")
    p = d.filter(F.col("doc_id") % PROBE_MOD == 0).select(
        "doc_id", F.substring(F.col("text"), 1, BWT_LEN).alias("s")
    )
    cat = F.concat(F.lit(Z_PAT + SENT2), F.col("s"))
    z = _zvals(cat, BWT_LEN + len(Z_PAT) + 1)
    zc = F.size(
        F.filter(
            F.slice(z, len(Z_PAT) + 2, F.size(z) - len(Z_PAT) - 1),
            lambda x: x >= len(Z_PAT),
        )
    ).cast("long")
    direct = (
        (
            F.length("s")
            - F.length(F.replace(F.col("s"), F.lit(Z_PAT), F.lit("")))
        )
        / len(Z_PAT)
    ).cast("long")
    return p.select(
        "doc_id",
        F.length("s").cast("long").alias("n"),
        zc.alias("z_count"),
        direct.alias("direct_count"),
        (zc == direct).cast("long").alias("ok"),
    ).orderBy("doc_id")


def _z_sql(src: str, nmax: int) -> str:
    """DuckDB Z-array of expression ``src`` (mirrors _zvals)."""
    lcp = (
        f"coalesce(list_min(list_filter(generate_series(1, {nmax}), "
        f"k -> k <= length({src}) - i + 1 AND "
        f"substr({src}, k, 1) <> substr({src}, i + k - 1, 1))) - 1, "
        f"least(length({src}) - i + 1, {nmax}))"
    )
    return (
        f"list_concat([length({src})::BIGINT], "
        f"list_transform(generate_series(2, length({src})), "
        f"i -> ({lcp})::BIGINT))"
    )


_ZARR_SQL = f"""
WITH p AS (
    SELECT doc_id, substr(text, 1, {BWT_LEN}) AS s
    FROM documents WHERE doc_id % {PROBE_MOD} = 0
),
zz AS (SELECT doc_id, s, {_z_sql('s', BWT_LEN)} AS z FROM p)
SELECT doc_id, length(s)::BIGINT AS n,
       coalesce(list_max(list_slice(z, 2, len(z))), 0)::BIGINT AS max_z,
       len(list_filter(list_slice(z, 2, len(z)), x -> x >= 4))::BIGINT
           AS n_z_ge4
FROM zz
ORDER BY doc_id
"""

_ZC_SQL = f"""
WITH p AS (
    SELECT doc_id, substr(text, 1, {BWT_LEN}) AS s
    FROM documents WHERE doc_id % {PROBE_MOD} = 0
),
cc AS (SELECT doc_id, s, '{Z_PAT}' || chr(2) || s AS cat FROM p),
zz AS (
    SELECT doc_id, s,
           {_z_sql('cat', BWT_LEN + len(Z_PAT) + 1)} AS z
    FROM cc
)
SELECT doc_id, length(s)::BIGINT AS n,
       len(list_filter(list_slice(z, {len(Z_PAT) + 2}, len(z)),
           x -> x >= {len(Z_PAT)}))::BIGINT AS z_count,
       ((length(s) - length(replace(s, '{Z_PAT}', '')))
           // {len(Z_PAT)})::BIGINT AS direct_count,
       (len(list_filter(list_slice(z, {len(Z_PAT) + 2}, len(z)),
           x -> x >= {len(Z_PAT)})) =
        (length(s) - length(replace(s, '{Z_PAT}', '')))
           // {len(Z_PAT)})::BIGINT AS ok
FROM zz
ORDER BY doc_id
"""

QUERIES = {
    "z_array": q_z_array,
    "z_count": q_z_count,
}

ORACLES = {
    "z_array": _ZARR_SQL,
    "z_count": _ZC_SQL,
}
