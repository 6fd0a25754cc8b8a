"""Corpus-law statistics, batch 128: the Heaps'-law vocabulary-growth
slope over document prefixes, and the Fano factor (burstiness) of
daily event arrivals — the two dataset-level laws a curator checks to
spot synthetic/templated corpora (vocabulary growing too slowly) and
bursty, non-Poisson traffic (Fano ≫ 1) before trusting throughput
projections.

Scale design (100 TB):
- ``heaps_fit``: K=8 nested doc-id prefixes; per prefix the token
  total is a conditional sum and the vocabulary size a conditional
  COUNT DISTINCT — all K ride ONE aggregate over the exploded token
  stream (the shuffle is token-keyed and partial-aggregated; the K
  distinct columns share it). The log-log OLS slope is computed on
  the K-row panel with x, y leaf-rounded to INTEGER micro-logs (1e6 — nano overflows the int64 products) first
  (heldout_ppl discipline) so the regression numerators are exact
  int64; output K rows + the shared slope in milli.
- ``fano_factor``: rides the peakops zero-filled daily spine (the one
  keyed agg); per type, F = (n·Σc² − S²)/(n·S) is exact integer
  arithmetic with a single milli floor at the end. Poisson arrivals
  give F ≈ 1; the audit flags types whose burstiness breaks the
  uniform-throughput assumption.

Reference parity: no corpus-statistics layer in the reference;
completes the law family (zipf_fit, good_turing, chao1, hapax_ratio)
with the growth-curve and burstiness members.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .peakops import _FILLED_SQL, _filled_series
from .util import DUCK_TOKENS, table, tokens

HEAPS_K = 8  # prefix points


def q_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law prefix curve + log-log OLS slope (module doc):
    K rows (k, n_tokens, vocab, slope_milli)."""
    d = table(spark, sf_dir, "documents", spread=True)
    n_docs = d.count()
    tok = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(tokens(F.col("text"))).alias("t"),
    )
    aggs = []
    for k in range(1, HEAPS_K + 1):
        cut = k * n_docs // HEAPS_K
        cond = F.col("doc_id") < cut
        aggs.append(F.sum(cond.cast("long")).alias(f"nt_{k}"))
        aggs.append(
            F.count_distinct(F.when(cond, F.col("t"))).alias(f"v_{k}")
        )
    piv = tok.agg(*aggs)
    # leaf-rounded micro-logs, then exact integer OLS over the K points
    for k in range(1, HEAPS_K + 1):
        piv = piv.withColumn(
            f"x_{k}", F.round(F.log(F.col(f"nt_{k}").cast("double")) * 1e6).cast("long")
        ).withColumn(
            f"y_{k}", F.round(F.log(F.col(f"v_{k}").cast("double")) * 1e6).cast("long")
        )
    sx = " + ".join(f"x_{k}" for k in range(1, HEAPS_K + 1))
    sy = " + ".join(f"y_{k}" for k in range(1, HEAPS_K + 1))
    sxy = " + ".join(f"x_{k} * y_{k}" for k in range(1, HEAPS_K + 1))
    sxx = " + ".join(f"x_{k} * x_{k}" for k in range(1, HEAPS_K + 1))
    piv = piv.withColumn(
        "slope_milli",
        F.expr(
            f"cast(({HEAPS_K} * ({sxy}) - ({sx}) * ({sy})) * 1000 div "
            f"({HEAPS_K} * ({sxx}) - ({sx}) * ({sx})) as bigint)"
        ),
    )
    rows = ", ".join(
        f"CAST({k} AS BIGINT), nt_{k}, v_{k}, slope_milli"
        for k in range(1, HEAPS_K + 1)
    )
    return piv.select(
        F.expr(
            f"stack({HEAPS_K}, {rows}) AS (k, n_tokens, vocab, slope_milli)"
        )
    ).orderBy("k")


def _heaps_sql() -> str:
    toks = DUCK_TOKENS.format(x="text")
    aggs = []
    for k in range(1, HEAPS_K + 1):
        cond = f"doc_id < {k} * (SELECT n FROM nn) // {HEAPS_K}"
        aggs.append(
            f"sum(CASE WHEN {cond} THEN 1 ELSE 0 END)::BIGINT AS nt_{k}"
        )
        aggs.append(
            f"count(DISTINCT CASE WHEN {cond} THEN t END)::BIGINT AS v_{k}"
        )
    logs = ", ".join(
        f"CAST(round(ln(nt_{k}::DOUBLE) * 1e6) AS BIGINT) AS x_{k}, "
        f"CAST(round(ln(v_{k}::DOUBLE) * 1e6) AS BIGINT) AS y_{k}"
        for k in range(1, HEAPS_K + 1)
    )
    sx = " + ".join(f"x_{k}" for k in range(1, HEAPS_K + 1))
    sy = " + ".join(f"y_{k}" for k in range(1, HEAPS_K + 1))
    sxy = " + ".join(f"x_{k} * y_{k}" for k in range(1, HEAPS_K + 1))
    sxx = " + ".join(f"x_{k} * x_{k}" for k in range(1, HEAPS_K + 1))
    selects = " UNION ALL ".join(
        f"SELECT {k}::BIGINT AS k, nt_{k} AS n_tokens, v_{k} AS vocab, "
        f"slope_milli FROM sl"
        for k in range(1, HEAPS_K + 1)
    )
    return f"""
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
tok AS (
    SELECT doc_id::BIGINT AS doc_id, unnest({toks}) AS t FROM documents
),
piv AS (SELECT {', '.join(aggs)} FROM tok),
lg AS (SELECT piv.*, {logs} FROM piv),
sl AS (
    SELECT lg.*,
           (({HEAPS_K} * ({sxy}) - ({sx}) * ({sy})) * 1000
            // ({HEAPS_K} * ({sxx}) - ({sx}) * ({sx})))::BIGINT
               AS slope_milli
    FROM lg
)
{selects}
ORDER BY k
"""


def q_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness of daily arrivals per type (module doc)."""
    s = _filled_series(spark, sf_dir)
    xs = F.col("xs")
    n = F.size(xs).cast("long")
    S = F.aggregate(xs, F.lit(0).cast("long"), lambda a, x: a + x)
    S2 = F.aggregate(xs, F.lit(0).cast("long"), lambda a, x: a + x * x)
    st = s.select(
        "typ",
        n.alias("n_days"),
        S.alias("sum_c"),
        S2.alias("sum_c2"),
    )
    var_num = F.col("n_days") * F.col("sum_c2") - F.col("sum_c") * F.col("sum_c")
    return st.select(
        "typ",
        "n_days",
        "sum_c",
        var_num.cast("long").alias("var_num"),
        F.expr(
            "cast((n_days * sum_c2 - sum_c * sum_c) * 1000 div "
            "(n_days * sum_c) as bigint)"
        ).alias("fano_milli"),
    ).orderBy("typ")


_FANO_SQL = f"""
WITH filled AS ({_FILLED_SQL}),
st AS (
    SELECT typ, len(xs)::BIGINT AS n_days,
           list_sum(xs)::BIGINT AS sum_c,
           list_sum(list_transform(xs, x -> x * x))::BIGINT AS sum_c2
    FROM filled
)
SELECT typ, n_days, sum_c,
       (n_days * sum_c2 - sum_c * sum_c)::BIGINT AS var_num,
       ((n_days * sum_c2 - sum_c * sum_c) * 1000
        // (n_days * sum_c))::BIGINT AS fano_milli
FROM st
ORDER BY typ
"""


QUERIES = {
    "heaps_fit": q_heaps_fit,
    "fano_factor": q_fano_factor,
}

ORACLES = {
    "heaps_fit": _heaps_sql(),
    "fano_factor": _FANO_SQL,
}
