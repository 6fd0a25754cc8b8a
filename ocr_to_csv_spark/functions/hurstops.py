"""Long-memory + state-space readout, batch 137: rescaled-range (R/S)
Hurst exponent and a local-level 1-D Kalman filter over the daily
event series — the "does this series have long memory?" readout and
the classic online level-tracking smoother next to ewma/holt_forecast.

Scale design (100 TB):
- Both ride the peakops zero-filled daily spine (ONE keyed agg +
  spine join); everything after is bounded in-row work per type.
- ``hurst_rs``: for dyadic window sizes w ∈ {4,8,16} the series is
  cut into ⌊n/w⌋ blocks; within a block the w·x − T_b centering makes
  the running cumulative deviation Z_t, its range R_int = max−min
  (scaled by w) and the deviation energy S2_int = Σ(w·x−T_b)²
  (= w³σ²) ALL exact int64 — the only floats are one ln per block,
  leaf-rounded to INTEGER nano (heldout_ppl discipline):
  ln(R/S) = ln R_int + ½ln w − ½ln S2_int. Constant blocks (S2=0)
  are excluded identically on both engines. With three equally-log-
  spaced windows the OLS slope collapses to (y₃−y₁)/(2·ln2), emitted
  in micro units — no regression machinery.
- ``kalman_1d``: the local-level filter (Q=1, R=4, x̂₀=y₁, P₀=R) is
  ONE sequential in-row fold per type with a 2-double accumulator
  [x̂, P] — fixed evaluation order on both engines gives bit parity
  (the power_iteration double discipline), leaf-rounded 9dp once on
  output. The final P is emitted so the test can pin convergence
  toward the algebraic Riccati fixed point.

Reference parity: no time-series layer in the reference; extends the
trend family (ewma, holt_forecast, cusum_drift, mann_kendall,
autocorr_daily, pacf, period_scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .peakops import _FILLED_SQL, _filled_series

RS_WINDOWS = (4, 8, 16)
MIN_LEN = 16  # need at least one block at the largest window
KAL_Q = 1.0
KAL_R = 4.0
NANO = 1_000_000_000
LN2 = "0.6931471805599453"


def _block_ln_nano(xs: Column, w: int) -> tuple[Column, Column]:
    """(Σ nano ln(R/S) over valid blocks, n_valid) for window w."""

    def block(b):
        lo = b * w  # 0-based block start
        tb = F.aggregate(
            F.sequence(F.lit(1), F.lit(w)),
            F.lit(0).cast("long"),
            lambda acc, i: acc + F.element_at(xs, lo + i),
        )
        zs = F.aggregate(
            F.sequence(F.lit(1), F.lit(w)),
            F.array(F.lit(0).cast("long")),
            lambda acc, i: F.concat(
                acc,
                F.array(
                    F.element_at(acc, -1)
                    + F.lit(w) * F.element_at(xs, lo + i)
                    - tb
                ),
            ),
        )
        r_int = F.array_max(zs) - F.array_min(zs)
        s2 = F.aggregate(
            F.sequence(F.lit(1), F.lit(w)),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + (F.lit(w) * F.element_at(xs, lo + i) - tb)
            * (F.lit(w) * F.element_at(xs, lo + i) - tb),
        )
        ln = F.round(
            (
                F.ln(r_int.cast("double"))
                + F.lit(0.5) * F.ln(F.lit(float(w)))
                - F.lit(0.5) * F.ln(s2.cast("double"))
            )
            * NANO
        ).cast("long")
        return F.when(
            s2 > 0,
            F.struct(ln.alias("ln"), F.lit(1).cast("long").alias("v")),
        ).otherwise(
            F.struct(
                F.lit(0).cast("long").alias("ln"),
                F.lit(0).cast("long").alias("v"),
            )
        )

    m = F.floor(F.size(xs) / w).cast("int")
    blocks = F.transform(F.sequence(F.lit(0), m - 1), block)
    tot = F.aggregate(
        blocks, F.lit(0).cast("long"), lambda acc, s: acc + s["ln"]
    )
    nv = F.aggregate(
        blocks, F.lit(0).cast("long"), lambda acc, s: acc + s["v"]
    )
    return tot, nv


def q_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per type (module doc): mean nano ln(R/S) at each w and
    the Hurst slope in micro units."""
    s = _filled_series(spark, sf_dir).filter(F.size("xs") >= MIN_LEN)
    xs = F.col("xs")
    out = s.select(
        "typ",
        *[
            c
            for w in RS_WINDOWS
            for c in (
                _block_ln_nano(xs, w)[0].alias(f"tot_{w}"),
                _block_ln_nano(xs, w)[1].alias(f"nv_{w}"),
            )
        ],
    )
    for w in RS_WINDOWS:
        out = out.withColumn(
            f"lnrs_{w}",
            F.expr(
                f"CAST(round(CAST(tot_{w} AS DOUBLE) / nv_{w}) AS BIGINT)"
            ),
        )
    lo, hi = RS_WINDOWS[0], RS_WINDOWS[-1]
    out = out.withColumn(
        "h_micro",
        F.expr(
            f"CAST(round(CAST(lnrs_{hi} - lnrs_{lo} AS DOUBLE) / "
            f"(2 * CAST({LN2} AS DOUBLE) * 1000)) AS BIGINT)"
        ),
    )
    return out.select(
        "typ",
        *[F.col(f"lnrs_{w}") for w in RS_WINDOWS],
        *[F.col(f"nv_{w}") for w in RS_WINDOWS],
        "h_micro",
    ).orderBy("typ")


def q_kalman_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-level Kalman filter per type (module doc): final level
    estimate, final error variance, series length."""
    s = _filled_series(spark, sf_dir).filter(F.size("xs") >= MIN_LEN)
    xs = F.col("xs")
    init = F.array(F.element_at(xs, 1).cast("double"), F.lit(KAL_R))
    rest = F.slice(xs, 2, F.size(xs) - 1)

    def step(acc, y):
        xh = F.element_at(acc, 1)
        p = F.element_at(acc, 2)
        ppred = p + F.lit(KAL_Q)
        k = ppred / (ppred + F.lit(KAL_R))
        newx = xh + k * (y.cast("double") - xh)
        newp = (F.lit(1.0) - k) * ppred
        return F.array(newx, newp)

    fin = F.aggregate(rest, init, step)
    return s.select(
        "typ",
        F.size(xs).cast("long").alias("n"),
        F.round(F.element_at(fin, 1), 9).alias("xhat"),
        F.round(F.element_at(fin, 2), 9).alias("pvar"),
    ).orderBy("typ")


def _duck_block(w: int) -> str:
    """(r_int, s2) struct per block b for window w (mirrors
    _block_ln_nano's exact-int core; xs 1-based). The running-Z range
    is one reduce carrying [cum, min, max] so the block total T_b is
    inlined only twice; the nano-ln/validity CASE is applied by a
    second list_transform in the SQL (no subqueries inside lambdas)."""
    x = f"xs[b*{w} + i]"
    tb = (
        f"list_sum(list_transform(generate_series(1, {w}), i -> {x}))"
        f"::BIGINT"
    )
    rng = (
        f"list_reduce(list_prepend([0::BIGINT, 0::BIGINT, 0::BIGINT], "
        f"list_transform(generate_series(1, {w}), "
        f"i -> [({w}*{x} - {tb})::BIGINT, 0::BIGINT, 0::BIGINT])), "
        f"(acc, dv) -> [acc[1] + dv[1], "
        f"least(acc[2], acc[1] + dv[1]), "
        f"greatest(acc[3], acc[1] + dv[1])])"
    )
    s2 = (
        f"list_sum(list_transform(generate_series(1, {w}), "
        f"i -> ({w}*{x} - {tb}) * ({w}*{x} - {tb})))::BIGINT"
    )
    return (
        f"list_transform("
        f"list_transform(generate_series(0, len(xs)//{w} - 1), b -> "
        f"struct_pack(rng := {rng}, s2 := {s2})), "
        f"t -> CASE WHEN t.s2 > 0 THEN struct_pack("
        f"ln := round((ln((t.rng[3] - t.rng[2])::DOUBLE) "
        f"+ 0.5*ln({w}::DOUBLE) - 0.5*ln(t.s2::DOUBLE)) * {NANO})::BIGINT, "
        f"v := 1::BIGINT) "
        f"ELSE struct_pack(ln := 0::BIGINT, v := 0::BIGINT) END)"
    )


def _hurst_sql() -> str:
    cols = []
    for w in RS_WINDOWS:
        cols.append(
            f"list_sum(list_transform(blk_{w}, s -> s.ln))::BIGINT AS tot_{w}"
        )
        cols.append(
            f"list_sum(list_transform(blk_{w}, s -> s.v))::BIGINT AS nv_{w}"
        )
    blks = ", ".join(f"{_duck_block(w)} AS blk_{w}" for w in RS_WINDOWS)
    lnrs = ", ".join(
        f"CAST(round(CAST(tot_{w} AS DOUBLE) / nv_{w}) AS BIGINT) AS lnrs_{w}"
        for w in RS_WINDOWS
    )
    lo, hi = RS_WINDOWS[0], RS_WINDOWS[-1]
    return f"""
WITH s AS ({_FILLED_SQL}),
base AS (SELECT typ, xs FROM s WHERE len(xs) >= {MIN_LEN}),
blks AS (SELECT typ, {blks} FROM base),
tots AS (SELECT typ, {', '.join(cols)} FROM blks),
ln AS (SELECT *, {lnrs} FROM tots)
SELECT typ, {', '.join(f'lnrs_{w}' for w in RS_WINDOWS)},
       {', '.join(f'nv_{w}' for w in RS_WINDOWS)},
       CAST(round(CAST(lnrs_{hi} - lnrs_{lo} AS DOUBLE) /
            (2 * CAST({LN2} AS DOUBLE) * 1000)) AS BIGINT) AS h_micro
FROM ln
ORDER BY typ
"""


_KALMAN_SQL = f"""
WITH s AS ({_FILLED_SQL})
SELECT typ,
       len(xs)::BIGINT AS n,
       round(fin[1], 9) AS xhat,
       round(fin[2], 9) AS pvar
FROM (
    SELECT typ, xs,
           list_reduce(
               list_prepend([xs[1]::DOUBLE, {KAL_R}],
                   list_transform(list_slice(xs, 2, len(xs)),
                                  y -> [y::DOUBLE, 0::DOUBLE])),
               (acc, yv) -> [
                   acc[1] + ((acc[2] + {KAL_Q}) / ((acc[2] + {KAL_Q}) + {KAL_R}))
                          * (yv[1] - acc[1]),
                   (1.0 - ((acc[2] + {KAL_Q}) / ((acc[2] + {KAL_Q}) + {KAL_R})))
                          * (acc[2] + {KAL_Q})
               ]) AS fin
    FROM s WHERE len(xs) >= {MIN_LEN}
)
ORDER BY typ
"""

QUERIES = {
    "hurst_rs": q_hurst_rs,
    "kalman_1d": q_kalman_1d,
}

ORACLES = {
    "hurst_rs": _hurst_sql(),
    "kalman_1d": _KALMAN_SQL,
}
