"""Generation-eval metrics, batch 134: corpus-pair BLEU-4 and ROUGE-L
over near-duplicate candidate pairs — the two classic text-overlap
metrics an LLM-data pipeline runs when comparing a generated/extracted
document against its reference (here: the corpus's planted near-dup
pairs, discovered by the engine itself).

Scale design (100 TB):
- Candidate pairs come from ONE equi-join on distinct 8-gram shingles
  (never all-pairs): per-doc distinct 8-grams explode, grams with
  document frequency > DF_CAP are dropped first (the ccnet/winnowing
  hot-shingle discipline — a boilerplate 8-gram shared by 10^6 pages
  would otherwise create a quadratic hot bucket), then the self-join
  keeps pairs sharing >= MIN_SHARED distinct grams. Pair count is
  bounded by real near-duplication, not corpus size.
- Both metrics are then bounded in-row expressions over the pair's two
  token arrays (capped at TOK_CAP): BLEU's clipped n-gram counts are
  exact integers (min of the candidate's gram count and the
  reference's, summed over the candidate's distinct grams); ROUGE-L's
  LCS is a prev-row-only DP fold (O(len) memory, unlike the flat
  matrix in smith_waterman — LCS needs no lookback past one row).
- Float discipline (heldout_ppl): each ln(p_n) is leaf-rounded to
  INTEGER nano-nats immediately; the brevity penalty is an exact
  rational floor; the emitted score ``log4_nano`` = 4·nano_bp +
  Σ nano_ln_p_n is pure int64 — no float ever crosses an aggregate.

Reference parity: no eval layer in the reference; extends the
pair-metric family (ngram_jaccard, containment_pairs, ppjoin_pairs)
and the eval family (mrr_eval, ndcg, team_draft).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import DUCK_HEX32, DUCK_TOKENS, table, tokens

TOK_CAP = 100  # tokens per doc entering the DP / n-gram counts
DF_CAP = 50  # 8-grams in more docs than this are boilerplate: dropped
MIN_SHARED = 3  # distinct shared 8-grams to become a candidate pair
NANO = 1_000_000_000


def _toks_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    return d.select(
        "doc_id", F.slice(tokens(F.col("text")), 1, TOK_CAP).alias("toks")
    )


def _grams(toks: Column, n: int) -> Column:
    sz = F.size(toks)
    return F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(1), sz - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _pairs(toks_df: DataFrame) -> DataFrame:
    """(doc_a < doc_b, toks_a, toks_b) candidate near-dup pairs (module
    doc: DF-capped distinct-8-gram equi-join, >= MIN_SHARED shared)."""
    g = toks_df.select(
        "doc_id", F.explode(F.array_distinct(_grams(F.col("toks"), 8))).alias("gram")
    )
    keep = g.groupBy("gram").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= DF_CAP
    )
    g = g.join(keep.select("gram"), "gram")
    a, b = g.alias("a"), g.alias("b")
    cand = (
        a.join(b, "gram")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= MIN_SHARED)
    )
    ta = toks_df.select(
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a")
    )
    tb = toks_df.select(
        F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b")
    )
    return F.broadcast(cand).join(ta, "doc_a").join(tb, "doc_b")


def _clipped(na: Column, nb: Column) -> Column:
    """Sum over distinct grams g of candidate nb: min(cnt_nb(g),
    cnt_na(g)) — BLEU's clipped modified-precision numerator."""
    return F.aggregate(
        F.array_distinct(nb),
        F.lit(0).cast("long"),
        lambda acc, g: acc
        + F.least(
            F.size(F.filter(nb, lambda y: y == g)),
            F.size(F.filter(na, lambda y: y == g)),
        ),
    )


def q_bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-4 components per candidate pair (module doc): doc_a is the
    reference, doc_b the candidate; log4_nano = 4*nano_bp + sum of
    nano-nat ln p_n."""
    p = _pairs(_toks_df(spark, sf_dir))
    ta, tb = F.col("toks_a"), F.col("toks_b")
    la, lb = F.size(ta), F.size(tb)
    cols = [
        F.col("doc_a"),
        F.col("doc_b"),
        la.cast("long").alias("len_a"),
        lb.cast("long").alias("len_b"),
    ]
    lnsum = F.lit(0).cast("long")
    for n in range(1, 5):
        num = _clipped(_grams(ta, n), _grams(tb, n))
        den = (lb - (n - 1)).cast("long")
        cols.append(num.alias(f"p{n}_num"))
        lnsum = lnsum + F.round(
            F.ln(num.cast("double") / den.cast("double")) * NANO
        ).cast("long")
    nano_bp = F.when(lb >= la, F.lit(0).cast("long")).otherwise(
        F.lit(NANO).cast("long")
        - F.floor(
            (F.lit(NANO).cast("long") * la.cast("long") + lb - 1) / lb
        ).cast("long")
    )
    cols.append((F.lit(4) * nano_bp + lnsum).cast("long").alias("log4_nano"))
    return p.select(*cols).orderBy("doc_a", "doc_b")


def _lcs(ta: Column, tb: Column) -> Column:
    """LCS length via a prev-row-only DP fold (module doc)."""
    zero = F.lit(0).cast("long")
    row0 = F.transform(F.sequence(F.lit(0), F.size(tb)), lambda _: zero)

    def outer(prev, av):
        def inner(row, bv):
            c = F.size(row)  # 1-based col being computed
            diag = F.get(prev, c - 1)
            up = F.get(prev, c)
            left = F.element_at(row, -1)
            val = F.when(av == bv, diag + 1).otherwise(
                F.greatest(up, left)
            ).cast("long")
            return F.concat(row, F.array(val))

        return F.aggregate(tb, F.array(zero), inner)

    return F.element_at(F.aggregate(ta, row0, outer), -1)


def q_rouge_l(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-L per candidate pair (module doc): LCS length plus the
    F-measure in exact milli (2000*lcs // (len_a+len_b))."""
    from .util import hex32

    p = _pairs(_toks_df(spark, sf_dir))
    ta, tb = F.col("toks_a"), F.col("toks_b")
    la, lb = F.size(ta).cast("long"), F.size(tb).cast("long")
    # fold over int64 token codes (hex32 of the token) so the DP
    # accumulator is a flat BIGINT row on both engines; the md5 is
    # identical in both, so even a (2^-32) collision stays in parity
    lcs = _lcs(F.transform(ta, hex32), F.transform(tb, hex32))
    return p.select(
        "doc_a",
        "doc_b",
        la.alias("len_a"),
        lb.alias("len_b"),
        lcs.alias("lcs"),
        F.floor((F.lit(2000) * lcs) / (la + lb)).cast("long").alias("f_milli"),
    ).orderBy("doc_a", "doc_b")


def _duck_grams(n: int, toks: str) -> str:
    if n == 1:
        return toks
    joined = " || ' ' || ".join(
        f"{toks}[i+{j}]" if j else f"{toks}[i]" for j in range(n)
    )
    return (
        f"list_transform(generate_series(1, greatest(len({toks}) - {n - 1},"
        f" 0)), i -> {joined})"
    )


_TOKS = DUCK_TOKENS.format(x="text")

_PAIR_CTE = f"""
tk AS (SELECT doc_id, list_slice({_TOKS}, 1, {TOK_CAP}) AS toks
       FROM documents),
g AS (SELECT doc_id, unnest(list_distinct({_duck_grams(8, 'toks')})) AS gram
      FROM tk),
keep AS (SELECT gram FROM g GROUP BY gram HAVING count(*) <= {DF_CAP}),
gk AS (SELECT doc_id, gram FROM g JOIN keep USING (gram)),
cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM gk a JOIN gk b USING (gram)
    WHERE b.doc_id > a.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {MIN_SHARED}
),
paired AS (
    SELECT doc_a, doc_b, ta.toks AS toks_a, tb.toks AS toks_b
    FROM cand
    JOIN tk ta ON ta.doc_id = doc_a
    JOIN tk tb ON tb.doc_id = doc_b
)"""


def _duck_clipped(na: str, nb: str) -> str:
    return (
        f"list_sum(list_transform(list_distinct({nb}), g -> least("
        f"len(list_filter({nb}, y -> y = g)), "
        f"len(list_filter({na}, y -> y = g)))))::BIGINT"
    )


def _bleu_sql() -> str:
    nums = []
    lns = []
    for n in range(1, 5):
        na = _duck_grams(n, "toks_a")
        nb = _duck_grams(n, "toks_b")
        nums.append(f"{_duck_clipped(na, nb)} AS p{n}_num")
        lns.append(
            f"round(ln(p{n}_num::DOUBLE / (len_b - {n - 1})) * {NANO})"
            f"::BIGINT"
        )
    return f"""
WITH {_PAIR_CTE},
comp AS (
    SELECT doc_a, doc_b,
           len(toks_a)::BIGINT AS len_a,
           len(toks_b)::BIGINT AS len_b,
           {', '.join(nums)}
    FROM paired
)
SELECT doc_a, doc_b, len_a, len_b, p1_num, p2_num, p3_num, p4_num,
       (4 * (CASE WHEN len_b >= len_a THEN 0
                  ELSE {NANO} - (({NANO} * len_a + len_b - 1) // len_b)
             END) + {' + '.join(lns)})::BIGINT AS log4_nano
FROM comp
ORDER BY doc_a, doc_b
"""


_ROUGE_SQL = f"""
WITH {_PAIR_CTE}
SELECT doc_a, doc_b,
       len(toks_a)::BIGINT AS len_a,
       len(toks_b)::BIGINT AS len_b,
       lcs,
       (2000 * lcs) // (len(toks_a) + len(toks_b)) AS f_milli
FROM (
    SELECT *,
           list_reduce(
               list_prepend(
                   list_transform(generate_series(0, len(toks_b)),
                                  x -> 0::BIGINT),
                   list_transform(toks_a,
                       a -> [{DUCK_HEX32.format(x='a')}])),
               (prev, avl) -> list_reduce(
                   list_prepend([0::BIGINT],
                       list_transform(toks_b,
                           b -> [{DUCK_HEX32.format(x='b')}])),
                   (row, bvl) -> list_append(row,
                       CASE WHEN avl[1] = bvl[1]
                            THEN prev[len(row)] + 1
                            ELSE greatest(prev[len(row) + 1], row[-1])
                       END))
           )[-1]::BIGINT AS lcs
    FROM paired
)
ORDER BY doc_a, doc_b
"""

QUERIES = {
    "bleu_pairs": q_bleu_pairs,
    "rouge_l": q_rouge_l,
}

ORACLES = {
    "bleu_pairs": _bleu_sql(),
    "rouge_l": _ROUGE_SQL,
}
