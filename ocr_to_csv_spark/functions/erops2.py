"""Entity-resolution surface, batch 84: phonetic (soundex) blocking
and Jaro-Winkler verification — the classic name-matching pipeline
(block on a cheap phonetic key, verify candidates with an edit-aware
similarity), completing the ER family (fuzzy_match, record_linkage,
snm_pairs, ppjoin_pairs, lev_verify).

Scale design (100 TB):
- ``soundex_block``: the blocking key is computed MAP-SIDE as a chain
  of regexp_replace / replace / substring expressions — the SAME chain
  in both engines, so no engine-builtin soundex variant ambiguity.
  (Simplified American Soundex, documented: adjacent same-class
  consonants collapse even across vowels/h/w — the h/w separator
  special case is deliberately out of scope and the same on both
  sides.) Block sizes come from one keyed aggregate; the block key is
  (soundex, token length) — multi-attribute blocking, the standard
  guard against one hot phonetic bucket.
- ``jaro_winkler``: candidate pairs are generated ONLY within blocks
  (self-equi-join on the block key over the DISTINCT name table — the
  name stream collapses to its vocabulary first, so pair count is
  bounded by vocab²/blocks, not corpus²), then verified by a
  vectorized Arrow-batched pandas UDF — the bounded verify stage, same
  tier as ``lev_verify``'s post-block edit distance. The UDF
  reimplements EXACTLY the semantics probed from the oracle engine:
  empty string → 0.0; match window max(0, ⌊max(|a|,|b|)/2⌋−1);
  transpositions counted over matched sequences; Winkler boost
  l·0.1·(1−jaro) with l = common prefix ≤ 4 applied ONLY when
  jaro > 0.7 (the original Winkler gate). Scores round to 9dp on both
  sides (the wilson_rank ulp-drift precedent).

Reference parity: the reference's J1 name fuzzy join
(``corrections.py:230-304``, reimplemented in
``extraction/matchers.py``) is a per-cell OCR-lattice matcher; this is
its corpus-scale relational counterpart for joining dirty name columns
across tables.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .util import table

JW_THRESHOLD = 0.88  # verified-pair emission cutoff
_SDX_CLASSES = [
    ("[bfpv]", "1"),
    ("[cgjkqsxz]", "2"),
    ("[dt]", "3"),
    ("[l]", "4"),
    ("[mn]", "5"),
    ("[r]", "6"),
    ("[aeiouyhw]", "0"),
]


def _names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct two-token part-name prefixes — the dirty-name stream
    collapsed to its (vocabulary-bounded) distinct values."""
    p = table(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return p.select(
        F.element_at(toks, 1).alias("t1"),
        F.concat_ws(
            " ", F.element_at(toks, 1), F.element_at(toks, 2)
        ).alias("name"),
    ).distinct()


_NAMES_SQL = """
    SELECT DISTINCT
           split_part(p_name, ' ', 1) AS t1,
           split_part(p_name, ' ', 1) || ' '
               || split_part(p_name, ' ', 2) AS name
    FROM part
"""


def _soundex_exprs(df: DataFrame, src: str) -> DataFrame:
    """Attach sdx = soundex(src) via the shared expression chain."""
    d = F.col(src)
    for pat, digit in _SDX_CLASSES:
        d = F.regexp_replace(d, pat, digit)
    # collapse digit runs per class — NO backreferences (the oracle
    # engine's RE2 regex dialect silently ignores them)
    for c in "0123456":
        d = F.regexp_replace(d, f"{c}{{2,}}", c)
    df = df.withColumn("_d", d)
    rest = F.when(
        F.substring(F.col("_d"), 1, 1) != "0",
        F.expr("substring(_d, 2)"),
    ).otherwise(F.col("_d"))
    code = F.concat(
        F.upper(F.substring(F.col(src), 1, 1)),
        F.rpad(F.substring(F.replace(rest, F.lit("0"), F.lit("")), 1, 3),
               3, "0"),
    )
    return df.withColumn("sdx", code).drop("_d")


def _soundex_sql(src: str) -> str:
    d = src
    for pat, digit in _SDX_CLASSES:
        d = f"regexp_replace({d}, '{pat}', '{digit}', 'g')"
    for c in "0123456":
        d = f"regexp_replace({d}, '{c}{{2,}}', '{c}', 'g')"
    rest = (
        f"CASE WHEN substring({d}, 1, 1) <> '0' "
        f"THEN substring({d}, 2) ELSE {d} END"
    )
    return (
        f"upper(substring({src}, 1, 1)) || "
        f"rpad(substring(replace({rest}, '0', ''), 1, 3), 3, '0')"
    )


def q_soundex_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking table: distinct first tokens with their
    soundex code and the (sdx, token length) block size."""
    names = _names(spark, sf_dir).select("t1").distinct()
    coded = _soundex_exprs(names, "t1")
    w = Window.partitionBy("sdx", F.length("t1"))
    return coded.select(
        "t1", "sdx",
        F.length("t1").cast("long").alias("t1_len"),
        F.count(F.lit(1)).over(w).alias("block_size"),
    )


_BLOCK_SQL = f"""
WITH names AS ({_NAMES_SQL}),
t AS (SELECT DISTINCT t1 FROM names),
coded AS (SELECT t1, {_soundex_sql('t1')} AS sdx FROM t)
SELECT t1, sdx, length(t1)::BIGINT AS t1_len,
       count(*) OVER (PARTITION BY sdx, length(t1))::BIGINT AS block_size
FROM coded
"""


def _jw_py(a: str, b: str) -> float:
    """Jaro-Winkler with the probed oracle semantics (module docstring)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    win = max(0, max(la, lb) // 2 - 1)
    ma = [False] * la
    mb = [False] * lb
    m = 0
    for i in range(la):
        lo, hi = max(0, i - win), min(lb, i + win + 1)
        for j in range(lo, hi):
            if not mb[j] and b[j] == a[i]:
                ma[i] = mb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if ma[i]:
            while not mb[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    if jaro <= 0.7:
        return jaro
    l = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca != cb:
            break
        l += 1
    return jaro + l * 0.1 * (1.0 - jaro)


def _jw_udf():
    """Arrow-batched pair scorer (built lazily — pandas_udf return-type
    resolution needs an active session)."""

    def score(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [_jw_py(x, y) for x, y in zip(a, b)], dtype="float64"
        )

    return pandas_udf(score, "double")


def q_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked Jaro-Winkler verification: candidate pairs within each
    (soundex, length) block of the distinct-name table, scored by the
    Arrow-batched UDF, emitted above JW_THRESHOLD (rounded 9dp)."""
    names = _names(spark, sf_dir)
    coded = _soundex_exprs(names, "t1").withColumn(
        "blk", F.concat(F.col("sdx"), F.lit("#"), F.length("t1"))
    )
    l = coded.select(F.col("blk"), F.col("name").alias("name_a"))
    r = coded.select(F.col("blk"), F.col("name").alias("name_b"))
    pairs = l.join(r, "blk").filter(F.col("name_a") < F.col("name_b"))
    scored = pairs.withColumn(
        "jw", F.round(_jw_udf()(F.col("name_a"), F.col("name_b")), 9)
    )
    return scored.filter(F.col("jw") >= JW_THRESHOLD).select(
        "name_a", "name_b", "jw"
    )


_JW_SQL = f"""
WITH names AS ({_NAMES_SQL}),
coded AS (
    SELECT name, {_soundex_sql('t1')} || '#' || length(t1) AS blk
    FROM names
),
pairs AS (
    SELECT a.name AS name_a, b.name AS name_b
    FROM coded a JOIN coded b ON a.blk = b.blk AND a.name < b.name
)
SELECT name_a, name_b,
       round(jaro_winkler_similarity(name_a, name_b), 9) AS jw
FROM pairs
WHERE round(jaro_winkler_similarity(name_a, name_b), 9) >= {JW_THRESHOLD}
"""


QUERIES = {
    "soundex_block": q_soundex_block,
    "jaro_winkler": q_jaro_winkler,
}

ORACLES = {
    "soundex_block": _BLOCK_SQL,
    "jaro_winkler": _JW_SQL,
}
