"""Time-series evaluation, batch 129: seasonal-naive forecast backtest
scored by exact-integer MASE, and a moving-block bootstrap confidence
interval for the daily mean with hash-chosen blocks — the "is the
forecast better than naive" and "how sure are we about the level"
readouts next to holt_forecast/forecast_revenue, with zero RNG state.

Scale design (100 TB):
- Both ride the peakops zero-filled daily spine (ONE keyed agg); all
  evaluation work is confined to each type's calendar-bounded array
  inside one row (the in-row bounded discipline).
- ``mase_backtest``: the last H=14 days are the test window; the
  seasonal-naive model predicts x[t−7], the scale is the in-window
  naive-1 MAE (the MASE denominator, Hyndman–Koehler). Both MAEs are
  exact int64 sums of absolute differences; the ratio takes one milli
  floor. MASE < 1000 ⟺ the seasonal model beats naive drift.
- ``block_bootstrap``: B=32 replicates, block length L=7; each
  replicate concatenates ⌈S/L⌉ blocks whose start offsets are
  hex32(type|rep|block) % (S−L+1) — deterministic, engine-shared
  (the weighted_sample zero-RNG discipline) — truncated to S days.
  Replicate means are milli-floored ints; the 2.5%/97.5% CI is an
  exact order statistic over the sorted 32-element array. Output one
  row per type.

Reference parity: no forecasting layer in the reference; completes the
series family (holt_forecast, seasonal_decompose, ewma, autocorr_daily,
changepoint) with the backtest metric and the uncertainty band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .peakops import _FILLED_SQL, _filled_series
from .util import DUCK_HEX32, hex32

MASE_H = 14  # test-window days
MASE_S = 7  # seasonal lag
BB_B = 32  # bootstrap replicates
BB_L = 7  # block length


def q_mase_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive backtest per type (module doc): one row per type
    (typ, n_days, mae_model, mae_naive, mase_milli)."""
    s = _filled_series(spark, sf_dir).filter(
        F.size("xs") >= MASE_H + MASE_S + 1
    )
    xs = F.col("xs")
    n = F.size(xs)
    ts = F.sequence(n - MASE_H + 1, n)  # 1-based test positions

    def at(i):
        return F.get(xs, (i - 1).cast("int"))

    mae_model = F.aggregate(
        ts,
        F.lit(0).cast("long"),
        lambda a, t: a + F.abs(at(t) - at(t - MASE_S)),
    )
    mae_naive = F.aggregate(
        ts,
        F.lit(0).cast("long"),
        lambda a, t: a + F.abs(at(t) - at(t - 1)),
    )
    st = s.select(
        "typ",
        n.cast("long").alias("n_days"),
        mae_model.alias("mae_model"),
        mae_naive.alias("mae_naive"),
    )
    return st.select(
        "typ",
        "n_days",
        "mae_model",
        "mae_naive",
        F.when(
            F.col("mae_naive") > 0,
            F.expr("cast(mae_model * 1000 div mae_naive as bigint)"),
        ).alias("mase_milli"),
    ).orderBy("typ")


_MASE_SQL = f"""
WITH filled AS ({_FILLED_SQL}),
st AS (
    SELECT typ, len(xs)::BIGINT AS n_days,
           list_sum(list_transform(
               generate_series(len(xs) - {MASE_H} + 1, len(xs)),
               t -> abs(xs[t] - xs[t - {MASE_S}])))::BIGINT AS mae_model,
           list_sum(list_transform(
               generate_series(len(xs) - {MASE_H} + 1, len(xs)),
               t -> abs(xs[t] - xs[t - 1])))::BIGINT AS mae_naive
    FROM filled WHERE len(xs) >= {MASE_H + MASE_S + 1}
)
SELECT typ, n_days, mae_model, mae_naive,
       CASE WHEN mae_naive > 0
            THEN (mae_model * 1000 // mae_naive)::BIGINT END AS mase_milli
FROM st
ORDER BY typ
"""


def q_block_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-block bootstrap CI of the daily mean per type
    (module doc): (typ, n_days, mean_milli, lo_milli, hi_milli)."""
    s = _filled_series(spark, sf_dir).filter(F.size("xs") >= 2 * BB_L)
    xs = F.col("xs")
    n = F.size(xs)
    n_blocks = F.ceil(n / BB_L).cast("int")
    n_starts = (n - BB_L + 1).cast("int")

    def block_sum(start, take):
        ks = F.sequence(F.lit(0), take - 1)
        return F.aggregate(
            ks,
            F.lit(0).cast("long"),
            lambda a, k: a + F.get(xs, (start - 1 + k).cast("int")),
        )

    def rep_mean(r):
        bs = F.sequence(F.lit(1), n_blocks)
        total = F.aggregate(
            bs,
            F.lit(0).cast("long"),
            lambda a, b: a
            + block_sum(
                hex32(
                    F.concat_ws(
                        "|", F.lit("bb"), F.col("typ"), r.cast("string"),
                        b.cast("string"),
                    )
                )
                % n_starts
                + 1,
                F.least(F.lit(BB_L), n - (b - 1) * BB_L),
            ),
        )
        return F.floor(total * 1000 / n).cast("long")

    reps = F.sort_array(
        F.transform(F.sequence(F.lit(1), F.lit(BB_B)), rep_mean)
    )
    mean_milli = F.floor(
        F.aggregate(xs, F.lit(0).cast("long"), lambda a, x: a + x) * 1000 / n
    ).cast("long")
    lo_idx = max(int(BB_B * 0.025), 0)  # 0-based
    hi_idx = min(int(BB_B * 0.975), BB_B - 1)
    return s.select(
        "typ",
        n.cast("long").alias("n_days"),
        mean_milli.alias("mean_milli"),
        F.get(reps, lo_idx).cast("long").alias("lo_milli"),
        F.get(reps, hi_idx).cast("long").alias("hi_milli"),
    ).orderBy("typ")


_BB_H = DUCK_HEX32.format(
    x="'bb' || '|' || typ || '|' || r::VARCHAR || '|' || b::VARCHAR"
)

_BB_SQL = f"""
WITH filled AS ({_FILLED_SQL}),
st AS (
    SELECT typ, xs, len(xs)::BIGINT AS n,
           CAST(ceil(len(xs) / {BB_L}.0) AS INTEGER) AS n_blocks,
           (len(xs) - {BB_L} + 1)::BIGINT AS n_starts
    FROM filled WHERE len(xs) >= {2 * BB_L}
),
reps AS (
    SELECT typ, n, xs,
           list_sort(list_transform(generate_series(1, {BB_B}), r ->
               CAST(floor(list_sum(list_transform(
                   generate_series(1, n_blocks), b ->
                   list_sum(list_transform(
                       generate_series(0, CAST(least({BB_L},
                           n - (b - 1) * {BB_L}) AS INTEGER) - 1),
                       k -> xs[(({_BB_H}) % n_starts + 1) + k]))
               )) * 1000.0 / n) AS BIGINT))) AS rm
    FROM st
)
SELECT typ, n AS n_days,
       CAST(floor(list_sum(xs) * 1000.0 / n) AS BIGINT) AS mean_milli,
       rm[{max(int(BB_B * 0.025), 0) + 1}]::BIGINT AS lo_milli,
       rm[{min(int(BB_B * 0.975), BB_B - 1) + 1}]::BIGINT AS hi_milli
FROM reps
ORDER BY typ
"""


QUERIES = {
    "mase_backtest": q_mase_backtest,
    "block_bootstrap": q_block_bootstrap,
}

ORACLES = {
    "mase_backtest": _MASE_SQL,
    "block_bootstrap": _BB_SQL,
}
