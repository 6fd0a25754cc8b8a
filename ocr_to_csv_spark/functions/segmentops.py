"""Subword segmentation, batch 101: unigram-LM Viterbi tokenization —
the decode half of a SentencePiece/unigram tokenizer (BPE's sibling;
``bpe_encode`` covers the merge-list family) run as a PURE CODEGEN
fold: no UDF, no per-position shuffle, exact integer milli-nat costs.

Scale design (100 TB):
- The whole DP lives INSIDE one row's expression: the forward pass is
  ``F.aggregate`` over positions 1..L carrying the dp array, each step
  taking ``array_min`` over a LITERAL vocab array of (piece, len,
  cost) structs — candidate = dp[i−ℓ] + cost when the piece matches
  ``substr(s, i−ℓ+1, ℓ)``. Cell encoding packs (total, back-pointer
  piece length) into one int64 (total·16 + ℓ, ℓ ≤ 8), so the
  accumulator stays a FLAT BIGINT ARRAY — the batch-89 discipline
  (DuckDB list_reduce corrupts struct-of-list accumulators; flat
  arrays are safe). The backtrack is a second bounded fold walking the
  packed back-pointers. Map-side only: 10^12 docs scale embarrassingly.
- Tie-break is deterministic BY ENCODING: array_min on
  (total·16 + (8−ℓ)) picks min total, then max piece length; two
  distinct pieces of equal length can never both match the same
  suffix, so the argmin is unique.
- Costs are integer milli-nats: corpus words 2500+150·len, planted
  ambiguity pieces slightly worse (so "tablescan" → table|scan beats
  tables|can on cost, not luck), single chars 9000 (the unk fallback
  that makes every input segmentable).

Reference parity: no tokenizer in the reference; completes the
LLM-tokenization family (bpe_merges, bpe_encode, token_stats,
pack_sequences) with the unigram decode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

PREF = 32  # segment the first PREF chars of the space-stripped text
BIG = 10**15  # candidate sentinel (encoded totals stay ≤ ~5·10^6)

_WORDS = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
_CHARS = list("abcdefghijklmnopqrstuvwy")
_DISTRACTORS = {  # plausible-but-costlier pieces that force real DP work
    "tables": 3900, "can": 3100, "mer": 3000, "ge": 2900,
    "win": 3050, "dow": 3050, "or": 2850, "der": 3000,
}

PIECES: dict[str, int] = (
    {w: 2500 + 150 * len(w) for w in _WORDS}
    | {c: 9000 for c in _CHARS}
    | _DISTRACTORS
)
VOCAB = sorted(PIECES.items())  # deterministic order, max len 8


def _stream(text: Column) -> Column:
    return F.substring(F.regexp_replace(text, r"\s+", ""), 1, PREF)


def _cells(s: Column) -> Column:
    """Forward Viterbi: dp array with packed back-pointers."""
    vocab = F.array(
        *[
            F.struct(
                F.lit(p).alias("p"),
                F.lit(len(p)).cast("long").alias("l"),
                F.lit(c).cast("long").alias("c"),
            )
            for p, c in VOCAB
        ]
    )

    def step(acc, i):
        cand = F.array_min(
            F.transform(
                vocab,
                lambda v: F.when(
                    (i >= v["l"])
                    & (F.substr(s, i - v["l"] + 1, v["l"]) == v["p"]),
                    (
                        F.floor(F.get(acc, (i - v["l"]).cast("int")) / 16)
                        .cast("long")
                        + v["c"]
                    )
                    * 16
                    + (8 - v["l"]),
                ).otherwise(F.lit(BIG).cast("long")),
            )
        )
        store = (
            F.floor(cand / 16).cast("long") * 16 + (8 - cand % 16)
        )
        return F.concat(acc, F.array(store))

    return F.aggregate(
        F.sequence(F.lit(1).cast("long"), F.length(s).cast("long")),
        F.array(F.lit(0).cast("long")),
        step,
    )


def q_unigram_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi-optimal segmentation of each doc's PREF-char stream
    under the unigram cost table (module doc). Emits (doc_id, stream,
    n_pieces, total_milli, seg)."""
    d = table(spark, sf_dir, "documents", spread=True)
    base = d.select(
        "doc_id", _stream(F.col("text")).alias("s")
    ).withColumn("cells", _cells(F.col("s")))
    L = F.length("s").cast("long")
    cells, s = F.col("cells"), F.col("s")

    def bstep(st, _):
        pos = st["pos"]
        plen = F.get(cells, pos.cast("int")) % 16
        piece = F.substr(s, pos - plen + 1, plen)
        return F.when(
            pos > 0,
            F.struct(
                (pos - plen).alias("pos"),
                F.concat(
                    piece,
                    F.when(st["seg"] == "", F.lit("")).otherwise(F.lit("|")),
                    st["seg"],
                ).alias("seg"),
                (st["np"] + 1).alias("np"),
            ),
        ).otherwise(st)

    bt = F.aggregate(
        F.sequence(F.lit(1).cast("long"), L),
        F.struct(
            L.alias("pos"),
            F.lit("").alias("seg"),
            F.lit(0).cast("long").alias("np"),
        ),
        bstep,
    )
    return base.select(
        "doc_id",
        F.col("s").alias("stream"),
        bt["np"].alias("n_pieces"),
        F.floor(F.element_at(cells, -1) / 16).cast("long").alias(
            "total_milli"
        ),
        bt["seg"].alias("seg"),
    ).orderBy("doc_id")


def _vocab_sql() -> str:
    items = ", ".join(
        f"struct_pack(p := '{p}', l := CAST({len(p)} AS BIGINT), "
        f"c := CAST({c} AS BIGINT))"
        for p, c in VOCAB
    )
    return "[" + items + "]"


_CAND = f"""list_min(list_transform({_vocab_sql()}, v ->
    CASE WHEN iw[1] >= v.l
          AND substr(s, CAST(iw[1] - v.l + 1 AS BIGINT),
                     CAST(v.l AS BIGINT)) = v.p
         THEN (acc[CAST(iw[1] - v.l + 1 AS BIGINT)] // 16 + v.c) * 16
              + (8 - v.l)
         ELSE CAST({BIG} AS BIGINT) END))"""

_POS = "CAST(split_part(st, '#', 1) AS BIGINT)"
_NP = "CAST(split_part(st, '#', 2) AS BIGINT)"
_SEG = "split_part(st, '#', 3)"
_BP = f"(cells[CAST({_POS} + 1 AS BIGINT)] % 16)"

# The backtrack accumulator is a STRING 'pos#np#seg', not a struct:
# DuckDB's list_reduce corrupts struct accumulators across steps (the
# batch-89 finding, re-measured here: totals/n_pieces agreed but struct
# pos/seg drifted), while flat scalar accumulators fold correctly.
_SEGMENT_SQL = f"""
WITH base AS (
    SELECT doc_id,
           substr(regexp_replace(text, '\\s+', '', 'g'), 1, {PREF}) AS s
    FROM documents
),
fwd AS (
    SELECT doc_id, s,
           list_reduce(
               list_prepend([CAST(0 AS BIGINT)],
                            list_transform(generate_series(1, len(s)),
                                           i -> [CAST(i AS BIGINT)])),
               (acc, iw) -> list_append(acc,
                   (({_CAND}) // 16) * 16 + (8 - ({_CAND}) % 16))
           ) AS cells
    FROM base
),
bt AS (
    SELECT doc_id, s, cells,
           list_reduce(
               list_prepend(CAST(len(s) AS VARCHAR) || '#0#',
                            list_transform(generate_series(1, len(s)),
                                           i -> '')),
               (st, ig) -> CASE WHEN {_POS} > 0 THEN
                   CAST({_POS} - {_BP} AS VARCHAR) || '#'
                   || CAST({_NP} + 1 AS VARCHAR) || '#'
                   || substr(s, CAST({_POS} - {_BP} + 1 AS BIGINT),
                             CAST({_BP} AS BIGINT))
                   || (CASE WHEN {_SEG} = '' THEN '' ELSE '|' END)
                   || {_SEG}
                   ELSE st END
           ) AS b
    FROM fwd
)
SELECT doc_id, s AS stream,
       CAST(split_part(b, '#', 2) AS BIGINT) AS n_pieces,
       (cells[-1] // 16)::BIGINT AS total_milli,
       split_part(b, '#', 3) AS seg
FROM bt
ORDER BY doc_id
"""


QUERIES = {"unigram_segment": q_unigram_segment}
ORACLES = {"unigram_segment": _SEGMENT_SQL}
