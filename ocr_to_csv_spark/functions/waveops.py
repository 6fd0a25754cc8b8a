"""Series sketching, batch 106: Haar wavelet energy decomposition and
SAX symbolization of the per-type daily-count series — the two classic
time-series REPRESENTATIONS (Chan & Fu's Haar similarity, Lin et al.'s
SAX / iSAX indexing) that let 10^9 series be compared by tiny sketches
instead of raw points.

Scale design (100 TB):
- Both ride the temporal2 ``_series`` shape: the ONLY event-scale work
  is one (type, day) keyed aggregate; everything after operates on
  calendar-bounded arrays inside one row's codegen expression.
- ``haar_energy``: the series zero-padded to 64 and run through the
  full 6-level UNNORMALIZED Haar pyramid (sums s'_j = s_{2j-1}+s_{2j},
  details d_j = s_{2j-1}−s_{2j} — no ÷2, so every coefficient and
  every per-level energy Σd² is an exact int64; Parseval holds in the
  weighted form Σ_t 2^{-t}·E_t + 2^{-6}·dc² = Σx² exactly over the
  rationals, test-pinned with integer arithmetic). The per-level
  energies are the scale signature used for wavelet similarity search.
  Each level's coefficients are computed DIRECTLY as differences of
  adjacent 2^{t-1}-wide block sums of the original array — the chained
  pyramid (each level referencing the previous level's expression)
  doubles the expression tree per level (measured: 1.2 MiB task
  binaries, minute-scale codegen); block sums keep it linear. No fold
  chains, no UDF.
- ``sax_word``: integer SAX variant — PAA segment sums over 8 windows
  of the padded series (exact ints), discretized into 4 symbols by
  fixed fractions of the series' own (min,max) segment range
  (bucket = ⌊(s−min)·4/(max−min+1)⌋ — integer, no Gaussian
  breakpoints, no floats; flat series collapse to 'aaaaaaaa').
  The resulting 8-char word is the iSAX bucket key: equal words =
  candidate neighbors, an equi-join at any scale.

Reference parity: no time-series layer in the reference; completes the
series family (dtw_dist/lcs_series = exact comparators, autocorr/
seasonal = structure) with the indexable-sketch half.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .temporal2 import _SERIES_SQL, _series

PAD = 64  # padded series length (calendar span ≤ 60 days)
LEVELS = 6  # log2(PAD)
SEGMENTS = 8  # SAX word length
SYMS = 4  # SAX alphabet size


def _padded(xs: Column) -> Column:
    zeros = F.array_repeat(F.lit(0).cast("long"), PAD)
    return F.slice(F.concat(xs, zeros), 1, PAD)


_PAD_SQL = (
    f"list_concat(xs, list_transform(generate_series(1, {PAD}), "
    f"z -> CAST(0 AS BIGINT)))[1:{PAD}]"
)


def q_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per type: DC term + per-level Haar detail energies (module
    doc)."""
    s = _series(spark, sf_dir)
    p = _padded(F.col("xs"))

    def _bsum(w: int, i) -> Column:
        """Sum of the i-th (1-based) width-w block of the padded series.
        Level-t Haar coefficients are differences of adjacent width
        2^{t-1} block sums, so every level reads the ORIGINAL array —
        the chained-pyramid formulation doubles the expression tree per
        level (measured: 1.2 MiB task binaries, minute-scale codegen);
        this one stays linear."""
        return F.aggregate(
            F.slice(p, ((i - 1) * w + 1).cast("int"), w),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )

    def _level_energy(t: int) -> Column:
        k = PAD >> t
        w = 1 << (t - 1)

        def diff(j):
            return _bsum(w, 2 * j - 1) - _bsum(w, 2 * j)

        return F.aggregate(
            F.transform(
                F.sequence(F.lit(1).cast("long"), F.lit(k).cast("long")),
                diff,
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x * x,
        )

    return s.select(
        "typ",
        F.col("n_days").cast("long").alias("n_days"),
        _bsum(PAD, F.lit(1).cast("long")).cast("long").alias("dc"),
        *[_level_energy(t).alias(f"e{t}") for t in range(1, LEVELS + 1)],
    ).orderBy("typ")


def _haar_sql() -> str:
    def bs(w: int, i_expr: str) -> str:
        return (
            f"CAST(list_sum(p[CAST(({i_expr}-1)*{w}+1 AS BIGINT)"
            f":CAST(({i_expr})*{w} AS BIGINT)]) AS BIGINT)"
        )

    levels = []
    for t in range(1, LEVELS + 1):
        k = PAD >> t
        w = 1 << (t - 1)
        d = f"({bs(w, '2*j-1')} - {bs(w, '2*j')})"
        levels.append(
            f"CAST(list_sum(list_transform(generate_series(1, {k}), "
            f"j -> {d} * {d})) AS BIGINT) AS e{t}"
        )
    return f"""
WITH s AS ({_SERIES_SQL}),
pp AS (SELECT typ, n_days, {_PAD_SQL} AS p FROM s)
SELECT typ, n_days,
       {bs(PAD, '1')} AS dc,
       {", ".join(levels)}
FROM pp
ORDER BY typ
"""


def q_sax_word(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per type: the 8-symbol integer-SAX word + PAA range (module
    doc)."""
    s = _series(spark, sf_dir)
    p = _padded(F.col("xs"))
    w = PAD // SEGMENTS
    seg = F.transform(
        F.sequence(F.lit(1).cast("long"), F.lit(SEGMENTS).cast("long")),
        lambda j: F.aggregate(
            F.slice(p, ((j - 1) * w + 1).cast("int"), w),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    )
    base = s.select("typ", F.col("n_days").cast("long").alias("n_days"),
                    seg.alias("seg"))
    smin, smax = F.array_min("seg"), F.array_max("seg")
    sym = F.transform(
        F.col("seg"),
        lambda v: F.char(
            97
            + F.floor(
                (v - smin) * SYMS / (smax - smin + 1)
            ).cast("long")
        ),
    )
    return base.select(
        "typ",
        "n_days",
        F.array_join(sym, "").alias("word"),
        smin.cast("long").alias("seg_min"),
        smax.cast("long").alias("seg_max"),
    ).orderBy("typ")


_SAX_SQL = f"""
WITH s AS ({_SERIES_SQL}),
seg AS (
    SELECT typ, n_days,
           list_transform(generate_series(1, {SEGMENTS}),
               j -> CAST(list_sum(({_PAD_SQL})
                        [CAST((j-1)*{PAD // SEGMENTS}+1 AS BIGINT)
                         :CAST(j*{PAD // SEGMENTS} AS BIGINT)])
                    AS BIGINT)) AS seg
    FROM s
),
mm AS (
    SELECT typ, n_days, seg,
           list_min(seg) AS smin, list_max(seg) AS smax
    FROM seg
)
SELECT typ, n_days,
       array_to_string(list_transform(seg,
           v -> chr(CAST(97 + floor((v - smin) * {SYMS} * 1.0
                                    / (smax - smin + 1)) AS INTEGER))),
           '') AS word,
       smin::BIGINT AS seg_min, smax::BIGINT AS seg_max
FROM mm
ORDER BY typ
"""


QUERIES = {
    "haar_energy": q_haar_energy,
    "sax_word": q_sax_word,
}

ORACLES = {
    "haar_energy": _haar_sql(),
    "sax_word": _SAX_SQL,
}
