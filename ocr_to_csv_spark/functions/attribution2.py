"""Attribution, batch 90: Markov removal-effect attribution — the
data-driven multi-touch model (Anderl et al.): build the journey
transition chain, compute conversion probability by absorbing-chain
value iteration, and credit each channel by how much P(conv) drops
when the channel is removed. Completes the attribution family
(last_touch heuristic, shapley_attribution coalition model).

Scale design (100 TB):
- The event-scale work is ONE user-keyed window pass (journeys =
  per-user chronological states truncated at the first conversion)
  plus ONE (a, b) transition groupBy — after that everything lives in
  a |states|²-sized single-row PIVOT (conditional-sum aggregate), and
  the K=16 value-iteration rounds are a pure expression chain over
  that one row: NO joins in the loop, no driver-side math.
- Float discipline: transition probabilities are single exact IEEE
  divisions of int64 counts; every iteration expression is GENERATED
  ONCE as a string and fed verbatim to both engines (Spark
  ``F.expr`` == the oracle's CTE text), so evaluation order is
  identical by construction — bit-equal without folds; final P values
  rounded 9dp.
- Removal semantics: removing channel c redirects every transition
  into c to NULL (the standard removal-effect convention), i.e. the
  b=c terms drop from every sum; all 1+|channels| scenarios ride the
  SAME single-row plan as extra columns.
- K=16 fixed rounds ⇒ P is the within-16-hops conversion probability
  (documented; journeys here are short, and both engines truncate
  identically).

Reference parity: no attribution layer in the reference; this is the
standard marketing-science counterpart to shapley_attribution over the
same events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import table

CHANNELS = ["click", "error", "signup", "view"]  # non-conversion types
K_ITERS = 16
SCEN = ["base"] + CHANNELS  # removal scenarios


def _f_expr(a: str, scen: str) -> str:
    """Σ_b p_a_b·f_b + p_a_conv, fixed order, skipping the removed b."""
    skip = None if scen == "base" else scen
    terms = [
        f"p_{a}_{b} * f_{b}_{scen}" for b in CHANNELS if b != skip
    ]
    terms.append(f"p_{a}_conv")
    return " + ".join(terms)


def _transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(a, b, cnt) journey transitions (module docstring semantics)."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    sec = F.unix_timestamp("ts").cast("long")
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    base = e.select(
        "user_id", "event_id", sec.alias("sec"),
        F.when(F.col("event_type") == "purchase", "CONV")
        .otherwise(F.col("event_type")).alias("st"),
    ).withColumn("rn", F.row_number().over(w))
    wfull = Window.partitionBy("user_id")
    conv_rn = F.min(F.when(F.col("st") == "CONV", F.col("rn"))).over(wfull)
    max_rn = F.max("rn").over(wfull)
    j = base.select(
        "user_id", "rn", "st",
        conv_rn.alias("conv_rn"), max_rn.alias("max_rn"),
    ).filter(
        F.col("conv_rn").isNull() | (F.col("rn") <= F.col("conv_rn"))
    )
    wo = Window.partitionBy("user_id").orderBy("rn")
    steps = j.select(
        F.coalesce(F.lag("st").over(wo), F.lit("START")).alias("a"),
        F.col("st").alias("b"),
        "rn", "max_rn", "conv_rn",
    )
    tails = j.filter(
        F.col("conv_rn").isNull() & (F.col("rn") == F.col("max_rn"))
    ).select(F.col("st").alias("a"), F.lit("NULL").alias("b"))
    return (
        steps.select("a", "b")
        .unionByName(tails)
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


_TRANS_SQL = """
    WITH base AS (
        SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS sec,
               CASE WHEN event_type = 'purchase' THEN 'CONV'
                    ELSE event_type END AS st,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY floor(epoch(ts))::BIGINT,
                                           event_id) AS rn
        FROM events WHERE user_id IS NOT NULL
    ),
    marked AS (
        SELECT user_id, rn, st,
               min(CASE WHEN st = 'CONV' THEN rn END)
                   OVER (PARTITION BY user_id) AS conv_rn,
               max(rn) OVER (PARTITION BY user_id) AS max_rn
        FROM base
    ),
    j AS (
        SELECT * FROM marked
        WHERE conv_rn IS NULL OR rn <= conv_rn
    ),
    steps AS (
        SELECT coalesce(lag(st) OVER (PARTITION BY user_id ORDER BY rn),
                        'START') AS a,
               st AS b
        FROM j
    ),
    tails AS (
        SELECT st AS a, 'NULL' AS b FROM j
        WHERE conv_rn IS NULL AND rn = max_rn
    ),
    allt AS (SELECT a, b FROM steps UNION ALL SELECT a, b FROM tails)
    SELECT a, b, count(*)::BIGINT AS cnt FROM allt GROUP BY a, b
"""

_A_STATES = ["START"] + CHANNELS
_B_STATES = CHANNELS + ["CONV", "NULL"]


def q_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Removal effect per channel: (channel, p_base, p_removed,
    effect_x1e9 = round((p_base−p_removed), 9)·1e9 as exact int64 of
    the rounded doubles). One row per channel."""
    t = _transitions(spark, sf_dir)
    aggs = []
    for a in _A_STATES:
        for b in _B_STATES:
            aggs.append(
                F.sum(
                    F.when(
                        (F.col("a") == a) & (F.col("b") == b), F.col("cnt")
                    ).otherwise(F.lit(0))
                ).alias(f"c_{a}_{b.lower()}")
            )
    piv = t.agg(*aggs)
    # probabilities (single exact divisions; 0-guard for empty rows)
    for a in _A_STATES:
        tot = " + ".join(f"c_{a}_{b.lower()}" for b in _B_STATES)
        piv = piv.withColumn(f"tot_{a}", F.expr(tot))
        for b in _B_STATES:
            piv = piv.withColumn(
                f"p_{a}_{b.lower()}",
                F.expr(
                    f"CASE WHEN tot_{a} > 0 THEN CAST(c_{a}_{b.lower()} "
                    f"AS DOUBLE) / CAST(tot_{a} AS DOUBLE) "
                    f"ELSE CAST(0.0 AS DOUBLE) END"
                ),
            )
    # value iteration, all scenarios in the same row
    for s in SCEN:
        for b in CHANNELS:
            if s != "base" and b == s:
                continue
            piv = piv.withColumn(f"f_{b}_{s}", F.lit(0.0))
    for _ in range(K_ITERS):
        news = []
        for s in SCEN:
            for a in CHANNELS:
                if s != "base" and a == s:
                    continue
                news.append((f"f_{a}_{s}", _f_expr(a, s)))
        keep = [c for c in piv.columns]
        piv = piv.select(
            *[F.col(c) for c in keep if not c.startswith("f_")],
            *[F.expr(e).alias(n) for n, e in news],
        )
    outs = []
    for s in SCEN:
        piv = piv.withColumn(
            f"P_{s}", F.round(F.expr(_f_expr("START", s)), 9)
        )
    for c in CHANNELS:
        outs.append(
            F.struct(
                F.lit(c).alias("channel"),
                F.col("P_base").alias("p_base"),
                F.col(f"P_{c}").alias("p_removed"),
                F.round(F.col("P_base") - F.col(f"P_{c}"), 9).alias(
                    "removal_effect"
                ),
            )
        )
    return piv.select(F.explode(F.array(*outs)).alias("r")).select(
        "r.channel", "r.p_base", "r.p_removed", "r.removal_effect"
    )


def _markov_sql() -> str:
    c_cols = ",\n       ".join(
        f"sum(CASE WHEN a = '{a}' AND b = '{b}' THEN cnt ELSE 0 END)"
        f"::BIGINT AS c_{a}_{b.lower()}"
        for a in _A_STATES
        for b in _B_STATES
    )
    tot_cols = ",\n       ".join(
        f"({' + '.join(f'c_{a}_{b.lower()}' for b in _B_STATES)}) AS tot_{a}"
        for a in _A_STATES
    )
    p_cols = ",\n       ".join(
        f"CASE WHEN tot_{a} > 0 THEN CAST(c_{a}_{b.lower()} AS DOUBLE) "
        f"/ CAST(tot_{a} AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END "
        f"AS p_{a}_{b.lower()}"
        for a in _A_STATES
        for b in _B_STATES
    )
    p_names = ", ".join(
        f"p_{a}_{b.lower()}" for a in _A_STATES for b in _B_STATES
    )
    f_init = ", ".join(
        f"CAST(0.0 AS DOUBLE) AS f_{b}_{s}"
        for s in SCEN
        for b in CHANNELS
        if not (s != "base" and b == s)
    )
    iters = []
    for k in range(K_ITERS):
        fs = ", ".join(
            f"{_f_expr(a, s)} AS f_{a}_{s}"
            for s in SCEN
            for a in CHANNELS
            if not (s != "base" and a == s)
        )
        # probabilities ride along every round (re-selected by name so
        # the single FROM keeps every reference unambiguous)
        iters.append(f"it{k + 1} AS (SELECT {p_names}, {fs} FROM it{k})")
    finals = ", ".join(
        f"round({_f_expr('START', s)}, 9) AS P_{s}" for s in SCEN
    )
    unions = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS channel, P_base AS p_base, P_{c} AS p_removed, "
        f"round(P_base - P_{c}, 9) AS removal_effect FROM fin"
        for c in CHANNELS
    )
    return f"""
WITH t AS ({_TRANS_SQL}),
c AS (SELECT {c_cols} FROM t),
tt AS (SELECT c.*, {tot_cols} FROM c),
p AS (SELECT tt.*, {p_cols} FROM tt),
it0 AS (SELECT {p_names}, {f_init} FROM p),
{",".join(iters)},
fin AS (SELECT {finals} FROM it{K_ITERS})
{unions}
"""


QUERIES = {
    "markov_removal": q_markov_removal,
}

ORACLES = {
    "markov_removal": _markov_sql(),
}
