"""Model-fitting + game-theoretic surface, batch 56: exact Shapley
channel attribution (the fair-division answer to last-touch's
first-order heuristic) and one exact ALS half-step (the recommender
training primitive — per-group closed-form ridge solve).

Scale design (100 TB):
- ``shapley_attribution``: the exponential part of Shapley lives over
  CHANNELS (n=4 ⇒ 16 coalitions), never over users. One groupBy
  reduces users to a ≤16-row mask-count table; each mask row explodes
  map-side to its ≤16 covering coalitions (no join — the superset
  test m & S = m is a filter on a constant 16-element literal); the
  marginal-contribution sum is a self-join of the 16-row v(S) table on
  S + 2^i. Values are exact integers scaled by 4! = 24, and
  Σᵢ φ24ᵢ = 24·(v(C) − v(∅)) is asserted as the efficiency axiom.
- ``als_step``: per-user ridge solve x = (QᵀQ + λI)⁻¹ Qᵀr with k=2
  and md5-derived integer item factors (data-independent literals,
  mirrored as CASE arms in the oracle): everything reduces to five
  partial-agg sums per user and a closed-form 2×2 inverse emitted as
  exact rationals (det, x_num) — no float crosses engines, no
  iteration, one shuffle on user. A full ALS alternates this shape.

Reference parity: no attribution/recsys layer in the reference;
extends ``attribution.py`` (last_touch, time_to_convert) and
``statsops.q_ols_fit`` (global exact regression → per-group solve).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

CHANNELS = ["click", "signup", "view", "error"]  # bit i = CHANNELS[i]
N_CH = len(CHANNELS)
# |S|!·(n−1−|S|)! for n=4, scaled Shapley weight numerators (÷ 4! = 24)
W24 = {0: 6, 1: 2, 2: 2, 3: 6}

ALS_LAMBDA = 1  # ridge term on the normal-equation diagonal


def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley value (×24) of each touch channel toward purchase
    conversion: v(S) = # purchasing users whose touch set ⊆ S."""
    ev = table(spark, sf_dir, "events")
    flags = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int"))
        .alias("purchased"),
        *[
            F.max((F.col("event_type") == c).cast("int")).alias(f"c{i}")
            for i, c in enumerate(CHANNELS)
        ],
    )
    masks = (
        flags.filter(F.col("purchased") == 1)
        .select(
            sum(
                (F.col(f"c{i}") * (1 << i) for i in range(N_CH)),
                F.lit(0),
            ).alias("mask")
        )
        .groupBy("mask")
        .agg(F.count("*").alias("cnt"))
    )
    coalitions = F.array(*[F.lit(s) for s in range(1 << N_CH)])
    v = (
        masks.select(
            "cnt", F.explode(coalitions).alias("s")
        )
        .filter(F.col("mask").bitwiseAND(F.col("s")) == F.col("mask"))
        .groupBy("s")
        .agg(F.sum("cnt").alias("v"))
    )
    # marginal contributions: for channel i, S ∌ i: w24(|S|)·(v(S∪i)−v(S))
    pop = sum(
        (F.shiftright(F.col("s"), i).bitwiseAND(1) for i in range(N_CH)),
        F.lit(0),
    )
    w24 = F.when(pop == 0, W24[0]).when(pop == 1, W24[1]) \
        .when(pop == 2, W24[2]).otherwise(W24[3])
    base = v.select("s", "v", w24.alias("w24"))
    out = None
    for i, c in enumerate(CHANNELS):
        lo = base.filter(
            F.shiftright(F.col("s"), i).bitwiseAND(1) == 0
        ).select(
            F.col("s"), F.col("v").alias("v_lo"), "w24",
            (F.col("s") + (1 << i)).alias("s_hi"),
        )
        hi = base.select(F.col("s").alias("s_hi"), F.col("v").alias("v_hi"))
        phi = (
            lo.join(hi, "s_hi", "left")
            .agg(
                F.lit(c).alias("channel"),
                F.sum(
                    F.col("w24")
                    * (F.coalesce("v_hi", F.lit(0)) - F.coalesce("v_lo", F.lit(0)))
                ).alias("phi24"),
            )
        )
        out = phi if out is None else out.unionByName(phi)
    return out


def _shapley_sql() -> str:
    ch_flags = ", ".join(
        f"max(CASE WHEN event_type = '{c}' THEN 1 ELSE 0 END) AS c{i}"
        for i, c in enumerate(CHANNELS)
    )
    mask_expr = " + ".join(f"c{i} * {1 << i}" for i in range(N_CH))
    pop = " + ".join(f"(s // {1 << i}) % 2" for i in range(N_CH))
    arms = []
    for i, c in enumerate(CHANNELS):
        arms.append(f"""
            SELECT '{c}' AS channel,
                   sum(lo.w24 * (coalesce(hi.v, 0) - coalesce(lo.v, 0)))
                       ::BIGINT AS phi24
            FROM wv lo LEFT JOIN vt hi ON hi.s = lo.s + {1 << i}
            WHERE (lo.s // {1 << i}) % 2 = 0
        """)
    return f"""
        WITH flags AS (
            SELECT user_id,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS purchased,
                   {ch_flags}
            FROM events GROUP BY user_id
        ),
        masks AS (
            SELECT {mask_expr} AS mask, count(*) AS cnt
            FROM flags WHERE purchased = 1 GROUP BY 1
        ),
        vt AS (
            SELECT s, sum(cnt) AS v
            FROM masks, (SELECT unnest(generate_series(0, {(1 << N_CH) - 1}))
                         AS s)
            WHERE (mask & s) = mask
            GROUP BY s
        ),
        wv AS (
            SELECT s, v,
                   CASE ({pop})
                       WHEN 0 THEN {W24[0]} WHEN 1 THEN {W24[1]}
                       WHEN 2 THEN {W24[2]} ELSE {W24[3]} END AS w24
            FROM vt
        )
        {" UNION ALL ".join(arms)}
    """


def _factor(t: str, j: int) -> int:
    """Small deterministic integer item factor, mirrored as a CASE arm
    in the oracle (md5 parity family, the rp_embed convention)."""
    h = int(hashlib.md5(f"als{t},{j}".encode()).hexdigest()[:8], 16)
    return (h % 7) - 3


def q_als_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact ALS half-step: per-user ridge solve against fixed
    integer item factors over (user, event_type) rating sums (cents).
    x = (QᵀQ+λI)⁻¹Qᵀr emitted as exact rationals (det, x1_num, x2_num)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    r = ev.groupBy("user_id", "event_type").agg(
        F.sum("cents").alias("r")
    )
    q1 = F.when(F.lit(False), 0)
    q2 = F.when(F.lit(False), 0)
    for t in CHANNELS + ["purchase"]:
        q1 = q1.when(F.col("event_type") == t, _factor(t, 1))
        q2 = q2.when(F.col("event_type") == t, _factor(t, 2))
    r = r.select("user_id", "r", q1.alias("q1"), q2.alias("q2"))
    agg = r.groupBy("user_id").agg(
        (F.sum(F.col("q1") * F.col("q1")) + ALS_LAMBDA).alias("a11"),
        F.sum(F.col("q1") * F.col("q2")).alias("a12"),
        (F.sum(F.col("q2") * F.col("q2")) + ALS_LAMBDA).alias("a22"),
        F.sum(F.col("q1") * F.col("r")).alias("b1"),
        F.sum(F.col("q2") * F.col("r")).alias("b2"),
    )
    return agg.select(
        "user_id",
        (F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12"))
        .alias("det"),
        (F.col("a22") * F.col("b1") - F.col("a12") * F.col("b2"))
        .alias("x1_num"),
        (F.col("a11") * F.col("b2") - F.col("a12") * F.col("b1"))
        .alias("x2_num"),
    )


def _als_sql() -> str:
    arm = lambda j: " ".join(
        f"WHEN event_type = '{t}' THEN {_factor(t, j)}"
        for t in CHANNELS + ["purchase"]
    )
    return f"""
        WITH r AS (
            SELECT user_id, event_type,
                   sum(round(value * 100)::BIGINT) AS r
            FROM events GROUP BY user_id, event_type
        ),
        q AS (
            SELECT user_id, r,
                   CASE {arm(1)} ELSE 0 END AS q1,
                   CASE {arm(2)} ELSE 0 END AS q2
            FROM r
        ),
        a AS (
            SELECT user_id,
                   sum(q1 * q1) + {ALS_LAMBDA} AS a11,
                   sum(q1 * q2) AS a12,
                   sum(q2 * q2) + {ALS_LAMBDA} AS a22,
                   sum(q1 * r) AS b1, sum(q2 * r) AS b2
            FROM q GROUP BY user_id
        )
        SELECT user_id,
               (a11 * a22 - a12 * a12)::BIGINT AS det,
               (a22 * b1 - a12 * b2)::BIGINT AS x1_num,
               (a11 * b2 - a12 * b1)::BIGINT AS x2_num
        FROM a
    """


QUERIES = {
    "shapley_attribution": q_shapley_attribution,
    "als_step": q_als_step,
}

ORACLES = {
    "shapley_attribution": _shapley_sql(),
    "als_step": _als_sql(),
}
