"""Seasonal + intermittent forecasting, batch 151: additive
Holt–Winters (triple exponential smoothing, weekly period) and
Croston's method for intermittent demand — completing the forecast
family (ewma → holt_forecast → holt_winters; croston for the sparse
series the others mishandle).

Scale design (100 TB):
- Both ride the peakops zero-filled daily spine; the recursions are
  ONE sequential in-row fold per type with a fixed-size double
  accumulator — the kalman_1d discipline (fixed evaluation order both
  engines, leaf-rounded 9dp on output).
- ``holt_winters``: α=0.2, β=0.1, γ=0.3, m=7; init from the first two
  cycles (level = cycle-1 mean, trend = (cycle-2 mean − cycle-1
  mean)/m, seasonals = cycle-1 deviations), fold from day m+1 with a
  10-double accumulator [level, trend, s₀..s₆, sse] — the season slot
  updates by index arithmetic inside a rebuilt array (elements carry
  (x, t) so the lambda knows the weekday). Emits the fitted state,
  in-sample SSE, and the 1- and 7-step-ahead forecasts.
- ``croston``: z (demand size) and p (inter-demand interval) update
  only on demand days (α=0.2), q counts days since demand; forecast =
  z/p. The test pins Croston's defining property: on an all-nonzero
  series it degenerates to simple exponential smoothing with p → 1.

Reference parity: no forecasting layer in the reference; extends
ewma, holt_forecast, seasonal_decompose, mase_backtest, kalman_1d.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .peakops import _FILLED_SQL, _filled_series

HW_M = 7
HW_A, HW_B, HW_G = 0.2, 0.1, 0.3
CR_A = 0.2
MIN_LEN = 21  # >= 3 weekly cycles


def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt–Winters per type (module doc): (typ, n, level,
    trend, sse, fc1, fc7)."""
    s = _filled_series(spark, sf_dir).filter(F.size("xs") >= MIN_LEN)
    xs = F.col("xs")
    n = F.size(xs)
    m1 = (
        F.aggregate(
            F.slice(xs, 1, HW_M),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).cast("double")
        / HW_M
    )
    m2 = (
        F.aggregate(
            F.slice(xs, HW_M + 1, HW_M),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).cast("double")
        / HW_M
    )
    init = F.concat(
        F.array(m1, (m2 - m1) / HW_M),
        F.transform(
            F.sequence(F.lit(1), F.lit(HW_M)),
            lambda i: F.element_at(xs, i).cast("double") - m1,
        ),
        F.array(F.lit(0.0)),
    )
    elems = F.transform(
        F.sequence(F.lit(HW_M + 1), n),
        lambda t: F.array(F.element_at(xs, t).cast("double"), t.cast("double")),
    )

    def step(acc, e):
        x = F.element_at(e, 1)
        t = F.element_at(e, 2)
        idx = ((t - 1) % HW_M).cast("int")  # weekday slot 0..6
        lvl = F.element_at(acc, 1)
        tr = F.element_at(acc, 2)
        si = F.element_at(acc, idx + 3)
        pred = lvl + tr + si
        newlvl = F.lit(HW_A) * (x - si) + F.lit(1 - HW_A) * (lvl + tr)
        newtr = F.lit(HW_B) * (newlvl - lvl) + F.lit(1 - HW_B) * tr
        newsi = F.lit(HW_G) * (x - newlvl) + F.lit(1 - HW_G) * si
        newsse = F.element_at(acc, 10) + (x - pred) * (x - pred)
        return F.transform(
            F.sequence(F.lit(1), F.lit(HW_M + 3)),
            lambda k: F.when(k == 1, newlvl)
            .when(k == 2, newtr)
            .when(k == HW_M + 3, newsse)
            .when(k == idx + 3, newsi)
            .otherwise(F.element_at(acc, k)),
        )

    fin = F.aggregate(elems, init, step)

    def fc(h):
        # next day is t = n+h; slot (n+h-1) % m
        idx = ((n + h - 1) % HW_M).cast("int")
        return (
            F.element_at(fin, 1)
            + h * F.element_at(fin, 2)
            + F.element_at(fin, idx + 3)
        )

    return s.select(
        "typ",
        n.cast("long").alias("n"),
        F.round(F.element_at(fin, 1), 9).alias("level"),
        F.round(F.element_at(fin, 2), 9).alias("trend"),
        F.round(F.element_at(fin, 10), 9).alias("sse"),
        F.round(fc(1), 9).alias("fc1"),
        F.round(fc(7), 9).alias("fc7"),
    ).orderBy("typ")


def q_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's intermittent-demand estimate per type (module doc):
    (typ, n, n_demand, z, p, forecast)."""
    s = _filled_series(spark, sf_dir).filter(F.size("xs") >= MIN_LEN)
    xs = F.col("xs")
    # state: [initialized(0/1), z, p, q, n_demand]
    init = F.array(
        F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(0.0)
    )

    def step(acc, x):
        inited = F.element_at(acc, 1)
        z = F.element_at(acc, 2)
        p = F.element_at(acc, 3)
        q = F.element_at(acc, 4)
        nd = F.element_at(acc, 5)
        xd = x.cast("double")
        first = (inited == 0) & (xd > 0)
        demand = (inited > 0) & (xd > 0)
        newz = F.when(first, xd).when(
            demand, z + F.lit(CR_A) * (xd - z)
        ).otherwise(z)
        newp = F.when(first, q).when(
            demand, p + F.lit(CR_A) * (q - p)
        ).otherwise(p)
        newq = F.when(xd > 0, F.lit(1.0)).otherwise(q + 1)
        return F.array(
            F.when(xd > 0, F.lit(1.0)).otherwise(inited),
            newz,
            newp,
            newq,
            nd + F.when(xd > 0, F.lit(1.0)).otherwise(F.lit(0.0)),
        )

    fin = F.aggregate(xs, init, step)
    return (
        s.select(
            "typ",
            F.size(xs).cast("long").alias("n"),
            F.element_at(fin, 5).cast("long").alias("n_demand"),
            F.round(F.element_at(fin, 2), 9).alias("z"),
            F.round(F.element_at(fin, 3), 9).alias("p"),
            F.round(
                F.element_at(fin, 2) / F.element_at(fin, 3), 9
            ).alias("forecast"),
        )
        .filter(F.col("n_demand") > 0)
        .orderBy("typ")
    )


_HW_STEP = (
    "list_transform(generate_series(1, {M3}), k -> "
    "CASE WHEN k = 1 THEN {A} * (e[1] - acc[((e[2]::BIGINT - 1) % {M})::INT"
    " + 3]) + {IA} * (acc[1] + acc[2]) "
    "WHEN k = 2 THEN {B} * (({A} * (e[1] - acc[((e[2]::BIGINT - 1) % {M})"
    "::INT + 3]) + {IA} * (acc[1] + acc[2])) - acc[1]) + {IB} * acc[2] "
    "WHEN k = {M3} THEN acc[{M3}] + (e[1] - (acc[1] + acc[2] + "
    "acc[((e[2]::BIGINT - 1) % {M})::INT + 3])) * (e[1] - (acc[1] + acc[2]"
    " + acc[((e[2]::BIGINT - 1) % {M})::INT + 3])) "
    "WHEN k = ((e[2]::BIGINT - 1) % {M})::INT + 3 THEN {G} * (e[1] - "
    "({A} * (e[1] - acc[((e[2]::BIGINT - 1) % {M})::INT + 3]) + {IA} * "
    "(acc[1] + acc[2]))) + {IG} * acc[((e[2]::BIGINT - 1) % {M})::INT + 3] "
    "ELSE acc[k] END)"
).format(
    M=HW_M, M3=HW_M + 3, A=HW_A, IA=1 - HW_A, B=HW_B, IB=1 - HW_B,
    G=HW_G, IG=1 - HW_G,
)

_HW_SQL = f"""
WITH s AS ({_FILLED_SQL}),
base AS (
    SELECT typ, xs, len(xs)::BIGINT AS n,
        (list_reduce(list_prepend([0::BIGINT],
            list_transform(list_slice(xs, 1, {HW_M}), x -> [x])),
            (a, xv) -> [a[1] + xv[1]])[1])::DOUBLE / {HW_M} AS m1,
        (list_reduce(list_prepend([0::BIGINT],
            list_transform(list_slice(xs, {HW_M + 1}, {2 * HW_M}),
                           x -> [x])),
            (a, xv) -> [a[1] + xv[1]])[1])::DOUBLE / {HW_M} AS m2
    FROM s WHERE len(xs) >= {MIN_LEN}
),
folded AS (
    SELECT typ, n,
        list_reduce(
            list_prepend(
                list_concat(list_concat(
                    [m1, (m2 - m1) / {HW_M}],
                    list_transform(generate_series(1, {HW_M}),
                                   i -> xs[i]::DOUBLE - m1)),
                    [0.0::DOUBLE]),
                list_transform(generate_series({HW_M + 1}, n::INT),
                               t -> [xs[t]::DOUBLE, t::DOUBLE])),
            (acc, e) -> {_HW_STEP}) AS fin
    FROM base
)
SELECT typ, n,
       round(fin[1], 9) AS level,
       round(fin[2], 9) AS trend,
       round(fin[{HW_M + 3}], 9) AS sse,
       round(fin[1] + 1 * fin[2] + fin[((n + 1 - 1) % {HW_M})::INT + 3], 9)
           AS fc1,
       round(fin[1] + 7 * fin[2] + fin[((n + 7 - 1) % {HW_M})::INT + 3], 9)
           AS fc7
FROM folded
ORDER BY typ
"""

_CR_STEP = (
    "[CASE WHEN xv[1] > 0 THEN 1.0::DOUBLE ELSE acc[1] END, "
    "CASE WHEN acc[1] = 0 AND xv[1] > 0 THEN xv[1] "
    "WHEN acc[1] > 0 AND xv[1] > 0 THEN acc[2] + {A} * (xv[1] - acc[2]) "
    "ELSE acc[2] END, "
    "CASE WHEN acc[1] = 0 AND xv[1] > 0 THEN acc[4] "
    "WHEN acc[1] > 0 AND xv[1] > 0 THEN acc[3] + {A} * (acc[4] - acc[3]) "
    "ELSE acc[3] END, "
    "CASE WHEN xv[1] > 0 THEN 1.0::DOUBLE ELSE acc[4] + 1 END, "
    "acc[5] + CASE WHEN xv[1] > 0 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END]"
).format(A=CR_A)

_CR_SQL = f"""
WITH s AS ({_FILLED_SQL})
SELECT typ, n, n_demand, z, p, forecast FROM (
    SELECT typ, len(xs)::BIGINT AS n,
           fin[5]::BIGINT AS n_demand,
           round(fin[2], 9) AS z,
           round(fin[3], 9) AS p,
           round(fin[2] / fin[3], 9) AS forecast
    FROM (
        SELECT typ, xs,
               list_reduce(
                   list_prepend(
                       [0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE,
                        1.0::DOUBLE, 0.0::DOUBLE],
                       list_transform(xs, x -> [x::DOUBLE, 0.0::DOUBLE,
                           0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE])),
                   (acc, xv) -> {_CR_STEP}) AS fin
        FROM s WHERE len(xs) >= {MIN_LEN}
    )
)
WHERE n_demand > 0
ORDER BY typ
"""

QUERIES = {
    "holt_winters": q_holt_winters,
    "croston": q_croston,
}

ORACLES = {
    "holt_winters": _HW_SQL,
    "croston": _CR_SQL,
}
