"""Spectral/seasonal readout, batch 136: candidate-period scan by
cycle folding and partial autocorrelation (Durbin–Levinson) of the
daily event series — the "which season length?" and "how many AR lags
really matter?" questions next to seasonal_decompose / autocorr_daily
/ holt_forecast.

Scale design (100 TB):
- Both ride the peakops zero-filled daily spine (ONE keyed agg + the
  gap_fill spine join); everything after is bounded in-row work on a
  types-sized table — no data-scale shuffle beyond the spine.
- ``period_scan``: for each candidate period p (2..PS_MAX) the series
  is truncated to full cycles (m = ⌊n/p⌋), folded into p phase
  buckets, and scored by the EXACT integer between-bucket deviation
  Σ_r (p·S_r − T_p)² — with equal bucket sizes this is the one-way
  ANOVA between-group sum of squares scaled by p²m², no rationals, no
  floats, directly comparable across types at fixed p. A planted
  weekly cycle maximizes the p=7 row; the truncate-to-full-cycles
  trick is what keeps the score exact (unequal bucket counts would
  force per-bucket denominators).
- ``pacf``: autocovariance numerators c_k = Σ (n·x_t − T)(n·x_{t+k}
  − T) are exact int64 in ONE in-row fold per lag (centering by n·x−T
  avoids the mean division); the Durbin–Levinson recursion to lag
  PACF_K then runs as generated scalar expressions on the per-type
  pivot row — the markov_removal/power_iteration device: identical
  expression text fed to both engines, fixed evaluation order, pure
  double arithmetic inside one row, leaf-rounded 9dp on output.

Reference parity: no time-series layer in the reference; extends the
seasonal family (seasonality_hour, seasonal_decompose, autocorr_daily,
fano_factor, matrix_profile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .peakops import _FILLED_SQL, _filled_series

PS_MIN = 2
PS_MAX = 10
PACF_K = 5
MIN_LEN = 24  # series shorter than this are skipped


def q_period_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(typ, p, n_used, score) for each candidate period (module
    doc); score = Σ_r (p·S_r − T_p)² over full cycles only."""
    s = _filled_series(spark, sf_dir).filter(F.size("xs") >= MIN_LEN)
    xs = F.col("xs")
    n = F.size(xs)
    rows = []
    for p in range(PS_MIN, PS_MAX + 1):
        m = F.floor(n / p).cast("int")
        tp = F.aggregate(
            F.sequence(F.lit(1), m * p),
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.element_at(xs, t),
        )
        sr = lambda r: F.aggregate(  # noqa: E731
            F.sequence(F.lit(1), m),
            F.lit(0).cast("long"),
            lambda acc, i: acc + F.element_at(xs, r + (i - 1) * p + 1),
        )
        score = F.aggregate(
            F.sequence(F.lit(0), F.lit(p - 1)),
            F.lit(0).cast("long"),
            lambda acc, r: acc
            + (F.lit(p) * sr(r) - tp) * (F.lit(p) * sr(r) - tp),
        )
        rows.append(
            F.struct(
                F.lit(p).cast("long").alias("p"),
                (m * p).cast("long").alias("n_used"),
                score.alias("score"),
            )
        )
    return (
        s.select("typ", F.explode(F.array(*rows)).alias("r"))
        .select("typ", "r.p", "r.n_used", "r.score")
        .orderBy("typ", "p")
    )


def _dl_exprs() -> dict[str, str]:
    """Durbin–Levinson over pivot columns c_0..c_K (exact ints):
    rho_k, phi_k_j, emitted pacf_k = round(phi_k_k, 9)."""
    ex: dict[str, str] = {}
    for k in range(1, PACF_K + 1):
        ex[f"rho_{k}"] = f"CAST(c_{k} AS DOUBLE) / CAST(c_0 AS DOUBLE)"
    ex["phi_1_1"] = "rho_1"
    for k in range(2, PACF_K + 1):
        num = f"rho_{k} - (" + " + ".join(
            f"phi_{k - 1}_{j} * rho_{k - j}" for j in range(1, k)
        ) + ")"
        den = "1 - (" + " + ".join(
            f"phi_{k - 1}_{j} * rho_{j}" for j in range(1, k)
        ) + ")"
        ex[f"phi_{k}_{k}"] = f"({num}) / ({den})"
        for j in range(1, k):
            ex[f"phi_{k}_{j}"] = (
                f"phi_{k - 1}_{j} - phi_{k}_{k} * phi_{k - 1}_{k - j}"
            )
    for k in range(1, PACF_K + 1):
        ex[f"pacf_{k}"] = f"round(phi_{k}_{k}, 9)"
    return ex


def q_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation to lag PACF_K per event type (module
    doc): (typ, lag, pacf)."""
    s = _filled_series(spark, sf_dir).filter(F.size("xs") >= MIN_LEN)
    xs = F.col("xs")
    n = F.size(xs).cast("long")
    t = F.aggregate(
        xs, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    piv = s.select("typ", xs.alias("xs"), n.alias("n"), t.alias("t"))
    for k in range(0, PACF_K + 1):
        ck = F.aggregate(
            F.sequence(F.lit(1), F.col("n").cast("int") - k),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + (F.col("n") * F.element_at(xs, i) - F.col("t"))
            * (F.col("n") * F.element_at(xs, i + k) - F.col("t")),
        )
        piv = piv.withColumn(f"c_{k}", ck)
    for name, text in _dl_exprs().items():
        piv = piv.withColumn(name, F.expr(text))
    stack = ", ".join(
        f"CAST({k} AS BIGINT), pacf_{k}" for k in range(1, PACF_K + 1)
    )
    return piv.select(
        "typ", F.expr(f"stack({PACF_K}, {stack}) AS (lag, pacf)")
    ).orderBy("typ", "lag")


def _period_sql() -> str:
    parts = []
    for p in range(PS_MIN, PS_MAX + 1):
        sr = (
            f"list_transform(generate_series(0, {p - 1}), r -> "
            f"list_sum(list_transform(generate_series(1, m), i -> "
            f"xs[r + (i-1)*{p} + 1]))::BIGINT)"
        )
        parts.append(
            f"SELECT typ, {p}::BIGINT AS p, (m*{p})::BIGINT AS n_used, "
            f"list_sum(list_transform({sr}, sr -> "
            f"({p}*sr - tp) * ({p}*sr - tp)))::BIGINT AS score "
            f"FROM (SELECT typ, xs, len(xs)//{p} AS m, "
            f"list_sum(list_slice(xs, 1, (len(xs)//{p})*{p}))::BIGINT AS tp "
            f"FROM s WHERE len(xs) >= {MIN_LEN})"
        )
    return (
        f"WITH s AS ({_FILLED_SQL})\n"
        + "\nUNION ALL\n".join(parts)
        + "\nORDER BY typ, p"
    )


def _pacf_sql() -> str:
    cks = []
    for k in range(0, PACF_K + 1):
        cks.append(
            f"list_sum(list_transform(generate_series(1, len(xs) - {k}), "
            f"i -> (len(xs)*xs[i] - t) * (len(xs)*xs[i + {k}] - t)))"
            f"::BIGINT AS c_{k}"
        )
    layers = [
        f"s AS ({_FILLED_SQL})",
        f"base AS (SELECT typ, xs, list_sum(xs)::BIGINT AS t FROM s "
        f"WHERE len(xs) >= {MIN_LEN})",
        "piv AS (SELECT typ, " + ", ".join(cks) + " FROM base)",
    ]
    prev = "piv"
    for i, (name, text) in enumerate(_dl_exprs().items()):
        cur = f"l{i}"
        layers.append(f"{cur} AS (SELECT *, {text} AS {name} FROM {prev})")
        prev = cur
    sel = " UNION ALL ".join(
        f"SELECT typ, {k}::BIGINT AS lag, pacf_{k} AS pacf FROM {prev}"
        for k in range(1, PACF_K + 1)
    )
    return "WITH " + ",\n".join(layers) + "\n" + sel + "\nORDER BY typ, lag"


QUERIES = {
    "period_scan": q_period_scan,
    "pacf": q_pacf,
}

ORACLES = {
    "period_scan": _period_sql(),
    "pacf": _pacf_sql(),
}
