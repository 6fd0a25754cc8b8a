"""Lempel–Ziv family, batch 169: the LZ78 dictionary parse and the
LZ76 complexity measure over probe documents — the missing LZ class
of the compression family (huffman_bits/elias_gamma cover entropy
coding; bwt_rle/mtf the transforms; here the dictionary methods), and
the sequence-complexity score EEG/biosignal pipelines lifted from the
same paper.

Scale design (100 TB):
- Probe-doc 64-char slices (the bwt_rle audit discipline). Both are
  ONE sequential in-row fold per doc.
- ``lz78_phrases``: the classic parse — extend the current phrase
  while phrase+c is in the dictionary, else emit and insert; the
  accumulator is a FLAT VARCHAR[] ([cnt, open-phrase, dict...]) —
  a struct-with-list accumulator miscompiles in DuckDB's
  list_reduce, so both engines fold the identical flat shape.
  Emits phrase count, dictionary size and the open-phrase tail.
- ``lz_complexity`` (Lempel–Ziv 1976): a new component ends at i when
  s[start..i] does NOT occur inside s[1..i−1] — one bounded substring
  containment per position; the normalized complexity
  c(n)·log2(n)/n (milli, floor) is the repetitiveness score
  (alphabet-dependent — the binary n/log2 n ceiling does not apply
  to word text, so the test pins parse semantics, not a band).

Reference parity: no compression layer in the reference; extends
huffman_bits, elias_gamma_est, bwt_rle, mtf_encode, cdc_chunks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .bwtops import BWT_LEN, PROBE_MOD
from .util import table

NANO = 1_000_000_000


def _probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") % PROBE_MOD == 0).select(
        "doc_id", F.substring(F.col("text"), 1, BWT_LEN).alias("s")
    )


def q_lz78_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LZ78 parse per probe doc (module doc): (doc_id, n, n_phrases,
    dict_size, open_phrase_len)."""
    p = _probe(spark, sf_dir)
    s = F.col("s")
    n = F.length(s)
    chars = F.transform(
        F.sequence(F.lit(1), n), lambda i: s.substr(i, F.lit(1))
    )
    # flat VARCHAR[] state [cnt, w, dict...] — a struct-with-list
    # accumulator miscompiles in DuckDB's list_reduce, so BOTH engines
    # fold the same flat shape
    init = F.array(F.lit("0"), F.lit(""))

    def step(acc, c):
        cand = F.concat(F.element_at(acc, 2), c)
        d = F.slice(acc, 3, F.greatest(F.size(acc) - 2, F.lit(0)))
        hit = F.array_position(d, cand) > 0
        return F.when(
            hit,
            F.concat(
                F.array(F.element_at(acc, 1), cand), d
            ),
        ).otherwise(
            F.concat(
                F.array(
                    (F.element_at(acc, 1).cast("long") + 1).cast(
                        "string"
                    ),
                    F.lit(""),
                ),
                d,
                F.array(cand),
            )
        )

    fin = F.aggregate(chars, init, step)
    cnt = F.element_at(fin, 1).cast("long")
    w = F.element_at(fin, 2)
    return p.select(
        "doc_id",
        n.cast("long").alias("n"),
        (cnt + (F.length(w) > 0).cast("long")).alias("n_phrases"),
        (F.size(fin) - 2).cast("long").alias("dict_size"),
        F.length(w).cast("long").alias("open_phrase_len"),
    ).orderBy("doc_id")


def q_lz_complexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LZ76 complexity per probe doc (module doc): (doc_id, n, c,
    norm_milli)."""
    p = _probe(spark, sf_dir)
    s = F.col("s")
    n = F.length(s)
    # fold over positions; acc = [components, comp_start]
    init = F.array(F.lit(0).cast("long"), F.lit(1).cast("long"))

    def step(acc, i):
        start = F.element_at(acc, 2)
        comp = s.substr(start, i - start + 1)
        prefix = s.substr(F.lit(1), i - 1)
        novel = (F.instr(prefix, comp) == 0) | (i - start + 1 > i - 1)
        return F.when(
            novel,
            F.array(F.element_at(acc, 1) + 1, i + 1),
        ).otherwise(acc)

    fin = F.aggregate(F.sequence(F.lit(1), n), init, step)
    c = F.element_at(fin, 1) + (
        F.element_at(fin, 2) <= n
    ).cast("long")
    norm = F.floor(
        c.cast("double") * F.log2(n.cast("double")) / n * 1000
    ).cast("long")
    return p.select(
        "doc_id",
        n.cast("long").alias("n"),
        c.alias("c"),
        norm.alias("norm_milli"),
    ).orderBy("doc_id")


_PROBE_SQL = f"""
p AS (
    SELECT doc_id, substr(text, 1, {BWT_LEN}) AS s
    FROM documents WHERE doc_id % {PROBE_MOD} = 0
)"""

_LZ78_STEP = (
    "CASE WHEN list_position(list_slice(acc, 3, len(acc)), "
    "acc[2] || cv[1]) > 0 THEN "
    "list_concat([acc[1], acc[2] || cv[1]], "
    "list_slice(acc, 3, len(acc))) "
    "ELSE list_concat(list_concat([(acc[1]::BIGINT + 1)::VARCHAR, ''], "
    "list_slice(acc, 3, len(acc))), [acc[2] || cv[1]]) END"
)

_LZ78_SQL = f"""
WITH {_PROBE_SQL},
folded AS (
    SELECT doc_id, length(s)::BIGINT AS n,
           list_reduce(
               list_prepend(['0', ''],
                   list_transform(generate_series(1, length(s)),
                       i -> [substr(s, i, 1)])),
               (acc, cv) -> {_LZ78_STEP}) AS fin
    FROM p
)
SELECT doc_id, n,
       (fin[1]::BIGINT + (CASE WHEN length(fin[2]) > 0 THEN 1 ELSE 0
           END))::BIGINT AS n_phrases,
       (len(fin) - 2)::BIGINT AS dict_size,
       length(fin[2])::BIGINT AS open_phrase_len
FROM folded
ORDER BY doc_id
"""

_LZC_STEP = (
    "CASE WHEN strpos(substr(s, 1, iv[1]::INT - 1), "
    "substr(s, acc[2]::INT, (iv[1] - acc[2] + 1)::INT)) = 0 "
    "OR iv[1] - acc[2] + 1 > iv[1] - 1 "
    "THEN [acc[1] + 1, iv[1] + 1] ELSE acc END"
)

_LZC_SQL = f"""
WITH {_PROBE_SQL},
folded AS (
    SELECT doc_id, s, length(s)::BIGINT AS n,
           list_reduce(
               list_prepend([0::BIGINT, 1::BIGINT],
                   list_transform(generate_series(1, length(s)),
                                  i -> [i::BIGINT, 0::BIGINT])),
               (acc, iv) -> {_LZC_STEP}) AS fin
    FROM p
)
SELECT doc_id, n,
       (fin[1] + (CASE WHEN fin[2] <= n THEN 1 ELSE 0 END))::BIGINT AS c,
       floor((fin[1] + (CASE WHEN fin[2] <= n THEN 1 ELSE 0 END))::DOUBLE
           * log2(n::DOUBLE) / n * 1000)::BIGINT AS norm_milli
FROM folded
ORDER BY doc_id
"""

QUERIES = {
    "lz78_phrases": q_lz78_phrases,
    "lz_complexity": q_lz_complexity,
}

ORACLES = {
    "lz78_phrases": _LZ78_SQL,
    "lz_complexity": _LZC_SQL,
}
