"""Absorbing-chain readouts, batch 122: expected steps to absorption
(hitting time) and expected journey surprisal (entropy to absorption)
of the user-journey Markov chain — the "how long until an outcome" and
"how predictable is a journey" numbers next to markov_removal's
conversion attribution, over the identical first-order chain.

Scale design (100 TB):
- Both queries ride attribution2's transition extraction: event-scale
  work is ONE user-partition window pass + ONE (a, b) keyed aggregate
  (cnt table bounded by states²). The chain itself lives on a ONE-ROW
  pivot of conditional sums, and the K=32 value iterations
  h_a = 1 + Σ_b p_ab·h_b  and  e_a = H_a + Σ_b p_ab·e_b (transient b)
  are generated expressions fed verbatim to both engines (the
  markov_removal device): fixed-order double arithmetic inside one
  row, no joins in the loop, nothing collects, leaf-rounded 9dp on
  output. Per-step entropies H_a = Σ −p·ln p use a fixed term order
  with an explicit p > 0 guard, identical text in both engines.
- Output is states-bounded (5 rows per query) at any event volume.

Reference parity: no journey layer in the reference; completes the
chain family (markov_transitions, markov_removal, user_paths,
time_to_convert) with the absorption-time and surprisal readouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .attribution2 import _A_STATES, _B_STATES, _TRANS_SQL, _transitions

CH_K = 32  # value-iteration steps (geometric convergence)
_TRANSIENT = [a for a in _A_STATES if a != "START"]  # chain channels


def _p_layers() -> tuple[str, str, str]:
    """(c_cols, tot_cols, p_cols) SQL fragments shared by both engines
    (identical to markov_removal's pivot)."""
    c_cols = ", ".join(
        f"sum(CASE WHEN a = '{a}' AND b = '{b}' THEN cnt ELSE 0 END)"
        f"::BIGINT AS c_{a}_{b.lower()}"
        for a in _A_STATES
        for b in _B_STATES
    )
    tot_cols = ", ".join(
        f"({' + '.join(f'c_{a}_{b.lower()}' for b in _B_STATES)}) AS tot_{a}"
        for a in _A_STATES
    )
    p_cols = ", ".join(
        f"CASE WHEN tot_{a} > 0 THEN CAST(c_{a}_{b.lower()} AS DOUBLE) "
        f"/ CAST(tot_{a} AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END "
        f"AS p_{a}_{b.lower()}"
        for a in _A_STATES
        for b in _B_STATES
    )
    return c_cols, tot_cols, p_cols


def _h_expr(a: str, k: int) -> str:
    terms = [f"p_{a}_{b.lower()} * h{k}_{b}" for b in _TRANSIENT]
    return f"CASE WHEN tot_{a} > 0 THEN 1.0 + {' + '.join(terms)} " \
           f"ELSE 0.0 END"


def _H_expr(a: str) -> str:
    terms = [
        f"CASE WHEN p_{a}_{b.lower()} > 0 THEN "
        f"-p_{a}_{b.lower()} * ln(p_{a}_{b.lower()}) ELSE 0.0 END"
        for b in _B_STATES
    ]
    return " + ".join(terms)


def _e_expr(a: str, k: int) -> str:
    terms = [f"p_{a}_{b.lower()} * e{k}_{b}" for b in _TRANSIENT]
    return f"H_{a} + {' + '.join(terms)}"


def _pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _transitions(spark, sf_dir)
    aggs = []
    for a in _A_STATES:
        for b in _B_STATES:
            aggs.append(
                F.sum(
                    F.when((F.col("a") == a) & (F.col("b") == b), F.col("cnt"))
                    .otherwise(F.lit(0))
                ).cast("long").alias(f"c_{a}_{b.lower()}")
            )
    piv = t.agg(*aggs)
    for a in _A_STATES:
        piv = piv.withColumn(
            f"tot_{a}",
            F.expr(" + ".join(f"c_{a}_{b.lower()}" for b in _B_STATES)),
        )
    for a in _A_STATES:
        for b in _B_STATES:
            piv = piv.withColumn(
                f"p_{a}_{b.lower()}",
                F.expr(
                    f"CASE WHEN tot_{a} > 0 THEN CAST(c_{a}_{b.lower()} "
                    f"AS DOUBLE) / CAST(tot_{a} AS DOUBLE) "
                    f"ELSE CAST(0.0 AS DOUBLE) END"
                ),
            )
    return piv


def q_hitting_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected steps to absorption per state (module doc)."""
    piv = _pivot(spark, sf_dir)
    for a in _A_STATES:
        piv = piv.withColumn(f"h0_{a}", F.lit(0.0))
    for k in range(1, CH_K + 1):
        piv = piv.select(
            "*", *[
                F.expr(_h_expr(a, k - 1)).alias(f"h{k}_{a}")
                for a in _A_STATES
            ]
        )
    rows = ", ".join(f"'{a}', round(h{CH_K}_{a}, 9)" for a in _A_STATES)
    return piv.select(
        F.expr(f"stack({len(_A_STATES)}, {rows}) AS (state, h_steps)")
    ).orderBy("state")


def q_journey_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-step entropy and expected surprisal to absorption
    (module doc)."""
    piv = _pivot(spark, sf_dir)
    for a in _A_STATES:
        piv = piv.withColumn(f"H_{a}", F.expr(_H_expr(a)))
    for a in _A_STATES:
        piv = piv.withColumn(f"e0_{a}", F.lit(0.0))
    for k in range(1, CH_K + 1):
        piv = piv.select(
            "*", *[
                F.expr(_e_expr(a, k - 1)).alias(f"e{k}_{a}")
                for a in _A_STATES
            ]
        )
    rows = ", ".join(
        f"'{a}', round(H_{a}, 9), round(e{CH_K}_{a}, 9)" for a in _A_STATES
    )
    return piv.select(
        F.expr(
            f"stack({len(_A_STATES)}, {rows}) "
            "AS (state, step_entropy, journey_nats)"
        )
    ).orderBy("state")


def _chain_sql(kind: str) -> str:
    c_cols, tot_cols, p_cols = _p_layers()
    layers = [
        f"t AS ({_TRANS_SQL})",
        f"c AS (SELECT {c_cols} FROM t)",
        f"tt AS (SELECT c.*, {tot_cols} FROM c)",
        f"p AS (SELECT tt.*, {p_cols} FROM tt)",
    ]
    if kind == "hit":
        init = ", ".join(f"CAST(0.0 AS DOUBLE) AS h0_{a}" for a in _A_STATES)
        layers.append(f"it0 AS (SELECT p.*, {init} FROM p)")
        for k in range(1, CH_K + 1):
            fs = ", ".join(
                f"{_h_expr(a, k - 1)} AS h{k}_{a}" for a in _A_STATES
            )
            layers.append(f"it{k} AS (SELECT it{k - 1}.*, {fs} FROM it{k - 1})")
        selects = " UNION ALL ".join(
            f"SELECT '{a}' AS state, round(h{CH_K}_{a}, 9) AS h_steps "
            f"FROM it{CH_K}"
            for a in _A_STATES
        )
    else:
        hs = ", ".join(f"{_H_expr(a)} AS H_{a}" for a in _A_STATES)
        init = ", ".join(f"CAST(0.0 AS DOUBLE) AS e0_{a}" for a in _A_STATES)
        layers.append(f"hh AS (SELECT p.*, {hs} FROM p)")
        layers.append(f"it0 AS (SELECT hh.*, {init} FROM hh)")
        for k in range(1, CH_K + 1):
            fs = ", ".join(
                f"{_e_expr(a, k - 1)} AS e{k}_{a}" for a in _A_STATES
            )
            layers.append(f"it{k} AS (SELECT it{k - 1}.*, {fs} FROM it{k - 1})")
        selects = " UNION ALL ".join(
            f"SELECT '{a}' AS state, round(H_{a}, 9) AS step_entropy, "
            f"round(e{CH_K}_{a}, 9) AS journey_nats FROM it{CH_K}"
            for a in _A_STATES
        )
    return "WITH " + ",\n".join(layers) + "\n" + selects + "\nORDER BY state"


QUERIES = {
    "hitting_time": q_hitting_time,
    "journey_entropy": q_journey_entropy,
}

ORACLES = {
    "hitting_time": _chain_sql("hit"),
    "journey_entropy": _chain_sql("ent"),
}
