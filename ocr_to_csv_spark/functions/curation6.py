"""Training-data curation operators, batch 8: winnowing fingerprints and
feature-hashing document vectors.

Scale design (100 TB):
- ``winnowing`` is the robust local fingerprinting of MOSS (Schleimer,
  Wilkerson & Aiken, SIGMOD 2003): hash every k-gram, slide a window of
  w hashes, and keep the RIGHTMOST MINIMUM of each window. Guarantee:
  any shared substring of length >= k + w - 1 between two documents
  yields at least one identical selected fingerprint — unlike MinHash
  (whole-document similarity) this localizes *where* the overlap is,
  and unlike storing every k-gram hash it keeps only ~2/(w+1) of them.
  The entire selection is per-document array arithmetic inside one
  projection (ngrams → hashes → window mins via higher-order
  functions): map-side, codegen'd, zero shuffle before the final
  distinct — at 100 TB each executor fingerprints its own partition
  and only (doc_id, pos, fp) triples ever move. Downstream, an
  equi-join on fp finds cross-document plagiarized/duplicated passages
  the same way ``dup_spans`` consumes its 5-gram hashes.
- ``hash_embed`` is the hashing trick / feature hashing (Weinberger et
  al., ICML 2009): each token updates dimension ``h(tok) mod D`` with
  sign ``±1`` from a second independent hash slice, giving every
  document a fixed D-dim integer vector with NO vocabulary to build,
  broadcast, or keep consistent across a 1000-executor fleet — the
  cheap embedding that feeds the cosine/LSH/IVF dedup layers when no
  model embedding exists. One token explode + one (doc_id, idx)
  aggregate with map-side partial combine; the vector assembly is a
  per-doc map lookup over a constant 0..D-1 sequence.

Both are integer-exact, pure JVM-side expressions with DuckDB oracles
running identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import (
    DUCK_HEX32,
    DUCK_HEX32B,
    DUCK_TOKENS,
    duck_ngrams,
    hex32,
    hex32b,
    ngrams,
    table,
    tokens,
)

W_K = 4  # winnowing k-gram size (tokens)
W_WIN = 5  # winnowing window size (hashes); detects overlaps >= k+w-1 = 8

HE_DIM = 32  # feature-hashing vector dimensionality


def q_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selected winnowing fingerprints per document: (doc_id, pos, fp)
    where ``pos`` is the 1-based k-gram position and ``fp`` the 32-bit
    k-gram hash chosen as the rightmost minimum of its window. Documents
    shorter than k tokens select nothing; documents with fewer than w
    k-grams select from the single short window (standard winnowing
    boundary behaviour)."""
    d = table(spark, sf_dir, "documents", spread=True)
    # Two disciplines keep this O(m) per document instead of the naive
    # O(m·w)-with-4×-reevaluation form this replaced (26 s → ~1 s at
    # sf0.01):
    # 1. Stage every multiply-referenced array behind its own projection
    #    boundary: HOF lambdas evaluate interpreted (no whole-stage
    #    codegen, no common-subexpression elimination), so a repeated
    #    subtree re-tokenizes + re-md5s the document at EVERY reference.
    #    Referencing each alias ≥2 times keeps CollapseProject from
    #    inlining the expensive producer back in.
    # 2. Sliding rightmost-min via a sparse table of doubling widths
    #    (the imaging X4 morphology trick): comb(a,b) = "b if b.v <= a.v
    #    else a" is idempotent and associative-with-overlap for the
    #    rightmost-minimum, so width-5 windows are comb of two
    #    overlapping width-4 spans — 3 zip_with passes total, no
    #    per-window slice.
    # The doubling ladder below (s2 width-2, s4 width-4, w5 = comb of two
    # width-4 spans) is hardcoded for W_WIN == 5; the DuckDB oracle
    # follows W_WIN, so a silent constant change would only surface at
    # the gate. Fail loudly here instead.
    assert W_WIN == 5, "winnowing ladder is built for W_WIN == 5"
    staged = d.select(
        "doc_id",
        F.transform(ngrams(F.lower(F.col("text")), W_K), hex32).alias("hs"),
    )

    def comb(a, b):  # rightmost minimum of two covered spans (b = right)
        return F.when(b["v"] <= a["v"], b).otherwise(a)

    hs = F.col("hs")
    m = F.size(hs)
    s0 = F.transform(
        hs,
        lambda h, i: F.struct(h.alias("v"), (i.cast("long") + 1).alias("p")),
    )
    st0 = staged.select("doc_id", m.alias("m"), s0.alias("s0"))
    mm = F.col("m")
    ln = lambda k: F.greatest(mm - k, F.lit(0))  # noqa: E731
    s2 = F.zip_with(  # width-2 spans [i, i+1]
        F.slice(F.col("s0"), 1, ln(1)), F.slice(F.col("s0"), 2, ln(1)), comb
    )
    st2 = st0.select("doc_id", "m", "s0", s2.alias("s2"))
    s4 = F.zip_with(  # width-4 spans [i, i+3]
        F.slice(F.col("s2"), 1, ln(3)), F.slice(F.col("s2"), 3, ln(3)), comb
    )
    st4 = st2.select("doc_id", "m", "s0", s4.alias("s4"))
    w5 = F.zip_with(  # width-5 windows [j, j+4], rightmost min each
        F.slice(F.col("s4"), 1, ln(4)), F.slice(F.col("s4"), 2, ln(4)), comb
    )
    # Documents with 0 < m < w select from the single short window
    # (standard winnowing boundary behaviour): fold comb over the
    # whole array.
    short = F.array(
        F.aggregate(
            F.slice(F.col("s0"), 2, ln(1)), F.element_at(F.col("s0"), 1), comb
        )
    )
    picks = (
        F.when(mm >= W_WIN, w5)
        .when(mm > 0, short)
        .otherwise(F.array().cast("array<struct<v:bigint,p:bigint>>"))
    )
    return (
        st4.select("doc_id", F.explode(picks).alias("p"))
        .select("doc_id", F.col("p.p").alias("pos"), F.col("p.v").alias("fp"))
        .distinct()
    )


def q_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed document vector: D-dim signed token-count vector,
    emitted as the canonical comma-joined string (the band_key idiom —
    arrays don't survive every result hasher) plus its exact integer
    squared L2 norm. Tokenless documents get the zero vector."""
    d = table(spark, sf_dir, "documents", spread=True)
    t = d.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    )
    comp = (
        t.select(
            "doc_id",
            (hex32(F.col("tok")) % HE_DIM).alias("idx"),
            F.when(hex32b(F.col("tok")) % 2 == 0, F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("sgn"),
        )
        .groupBy("doc_id", "idx")
        .agg(F.sum("sgn").alias("wgt"))
    )
    maps = comp.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("idx", "wgt"))).alias("m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(HE_DIM - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("m"), i.cast("long")), F.lit(0).cast("long")
        ),
    )
    return (
        d.select("doc_id")
        .join(maps, "doc_id", "left")
        .select(
            "doc_id",
            F.array_join(
                F.transform(vec, lambda x: x.cast("string")), ","
            ).alias("vec"),
            F.aggregate(
                vec, F.lit(0).cast("long"), lambda acc, x: acc + x * x
            ).alias("nrm2"),
        )
    )


QUERIES = {
    "winnowing": q_winnowing,
    "hash_embed": q_hash_embed,
}

_TOKS = DUCK_TOKENS.format(x="lower(text)")
_HG = DUCK_HEX32.format(x="g")

ORACLES = {}

ORACLES["winnowing"] = f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    gr AS (SELECT doc_id, {duck_ngrams(W_K)} AS grams FROM tk),
    hh AS (
        SELECT doc_id,
               list_transform(grams, g -> {_HG}) AS hs
        FROM gr
    ),
    pk AS (
        SELECT doc_id,
               list_transform(
                   generate_series(1, greatest(len(hs) - {W_WIN - 1}, 1)),
                   j -> struct_pack(
                       pos := j + len(list_slice(hs, j, j + {W_WIN - 1}))
                              - list_position(
                                    list_reverse(
                                        list_slice(hs, j, j + {W_WIN - 1})),
                                    list_min(
                                        list_slice(hs, j, j + {W_WIN - 1}))),
                       fp := list_min(list_slice(hs, j, j + {W_WIN - 1}))
                   )
               ) AS picks
        FROM hh WHERE len(hs) > 0
    )
    SELECT DISTINCT doc_id, p.pos::BIGINT AS pos, p.fp::BIGINT AS fp
    FROM (SELECT doc_id, unnest(picks) AS p FROM pk)
"""

_HT = DUCK_HEX32.format(x="tok")
_HTB = DUCK_HEX32B.format(x="tok")

ORACLES["hash_embed"] = f"""
    WITH t AS (
        SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ),
    c AS (
        SELECT doc_id, ({_HT} % {HE_DIM}) AS idx,
               sum(CASE WHEN {_HTB} % 2 = 0 THEN 1 ELSE -1 END)::BIGINT
                   AS wgt
        FROM t GROUP BY 1, 2
    ),
    grid AS (
        SELECT d.doc_id, i.idx
        FROM (SELECT DISTINCT doc_id FROM documents) d
        CROSS JOIN (SELECT unnest(generate_series(0, {HE_DIM - 1})) AS idx) i
    )
    SELECT g.doc_id,
           array_to_string(list(coalesce(c.wgt, 0) ORDER BY g.idx), ',')
               AS vec,
           sum(coalesce(c.wgt, 0) * coalesce(c.wgt, 0))::BIGINT AS nrm2
    FROM grid g LEFT JOIN c ON c.doc_id = g.doc_id AND c.idx = g.idx
    GROUP BY g.doc_id
"""
