"""Probabilistic sequence/classification ML, batch 86: multinomial
naive Bayes language classification and Viterbi HMM decoding — the two
classic log-space dynamic programs, done with the repo's float-parity
disciplines.

Scale design (100 TB):
- ``naive_bayes``: train/test split by doc-hash parity (the
  record_linkage split). Training is two keyed aggregates ((label,
  token) counts + label totals) — pure map-side-partial shuffles.
  Scoring explodes test tokens (map-side), broadcast-crosses the
  |labels|-row class table (bounded, allowlisted — the
  theta_intersect tier), LEFT-joins the (token, label) count table
  (hash join on the token key; the count table is vocabulary-sized,
  broadcastable in practice), and folds per-(doc,label) log
  contributions. Float discipline: every ln() is ROUNDED TO 9dp AT THE
  LEAF (so cross-engine libm 1-ulp drift dies before accumulation —
  stronger than char_entropy's final-rounding), the per-(doc,label)
  sum is the standard sorted fold, and the argmax ranks by
  (rounded score desc, label asc) — fully deterministic.
- ``viterbi_path``: per-user maximum-likelihood hidden-state decode
  under a fixed 2-state HMM whose transition/emission/init tables are
  INTEGER MILLI-NAT literals (ln×10^6, precomputed in Python and
  embedded identically in both plans — the NDCG_W device), so the
  whole DP is EXACT int64 arithmetic: zero float hazard. The fold
  carries, per state, (score, best path) and resolves ties toward the
  lower state id; sequences are per-user (the user_paths shape), so
  the DP is user-confined — one keyed shuffle, then pure codegen.

Reference parity: no ML layer in the reference; NB is the bayesian
counterpart of quality_classifier (logistic-shaped integer scorer) and
viterbi the probabilistic counterpart of markov_transitions /
user_paths.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import DUCK_HEX32, DUCK_TOKENS, hex32, table, tokens

# ---------------------------------------------------------------- NB --

NB_ROUND = 9  # leaf-level ln rounding (dp)


def _nb_parts(spark: SparkSession, sf_dir: str):
    d = table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "lang",
        F.pmod(hex32(F.col("doc_id").cast("string")), F.lit(2)).alias("h"),
        tokens(F.col("text")).alias("toks"),
    )
    train = d.filter(F.col("h") == 0)
    test = d.filter(F.col("h") == 1)
    return train, test


def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial NB: predict each held-out document's lang from its
    tokens (Laplace α=1); emits (doc_id, true_lang, pred_lang, score).
    Float discipline per module docstring."""
    train, test = _nb_parts(spark, sf_dir)
    tr_tok = train.select(
        "lang", F.explode("toks").alias("tok")
    )
    counts = tr_tok.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    totals = tr_tok.groupBy("lang").agg(F.count(F.lit(1)).alias("tot"))
    vocab = tr_tok.agg(
        F.countDistinct("tok").alias("v")
    )
    priors = train.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    n_train = train.agg(F.count(F.lit(1)).alias("n_train"))
    classes = (
        totals.join(priors, "lang")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_train))
        .select(
            F.col("lang").alias("cls"), "tot", "v",
            F.round(
                F.log(F.col("n_docs").cast("double")
                      / F.col("n_train").cast("double")),
                NB_ROUND,
            ).alias("ln_prior"),
        )
    )
    te_tok = test.select(
        "doc_id", F.col("lang").alias("true_lang"),
        F.explode("toks").alias("tok"),
    )
    cand = te_tok.crossJoin(F.broadcast(classes))
    scored_tok = cand.join(
        counts.withColumnRenamed("lang", "cls"), ["cls", "tok"], "left"
    ).select(
        "doc_id", "true_lang", "cls", "ln_prior",
        F.round(
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("double")
                / (F.col("tot") + F.col("v")).cast("double")
            ),
            NB_ROUND,
        ).alias("contrib"),
    )
    per_class = scored_tok.groupBy(
        "doc_id", "true_lang", "cls", "ln_prior"
    ).agg(
        F.aggregate(
            F.sort_array(F.collect_list("contrib")),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("ll"),
    )
    ranked = per_class.select(
        "doc_id", "true_lang", "cls",
        F.round(F.col("ln_prior") + F.col("ll"), 6).alias("score"),
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.desc("score"), F.asc("cls")
            )
        ),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "doc_id", "true_lang", F.col("cls").alias("pred_lang"), "score"
    )


_NB_SQL = f"""
WITH d AS (
    SELECT doc_id, lang,
           {DUCK_HEX32.format(x='doc_id::VARCHAR')} % 2 AS h,
           {DUCK_TOKENS.format(x='text')} AS toks
    FROM documents
),
tr_tok AS (
    SELECT lang, unnest(toks) AS tok FROM d WHERE h = 0
),
counts AS (SELECT lang AS cls, tok, count(*)::BIGINT AS cnt
           FROM tr_tok GROUP BY 1, 2),
totals AS (SELECT lang AS cls, count(*)::BIGINT AS tot
           FROM tr_tok GROUP BY 1),
vocab AS (SELECT count(DISTINCT tok)::BIGINT AS v FROM tr_tok),
priors AS (SELECT lang AS cls, count(*)::BIGINT AS n_docs
           FROM d WHERE h = 0 GROUP BY 1),
n_train AS (SELECT count(*)::BIGINT AS n_train FROM d WHERE h = 0),
classes AS (
    SELECT t.cls, t.tot, vocab.v,
           round(ln(p.n_docs::DOUBLE / n_train.n_train::DOUBLE),
                 {NB_ROUND}) AS ln_prior
    FROM totals t JOIN priors p USING (cls)
    CROSS JOIN vocab CROSS JOIN n_train
),
te_tok AS (
    SELECT doc_id, lang AS true_lang, unnest(toks) AS tok
    FROM d WHERE h = 1
),
scored_tok AS (
    SELECT te.doc_id, te.true_lang, c.cls, c.ln_prior,
           round(ln((coalesce(k.cnt, 0) + 1)::DOUBLE
                    / (c.tot + c.v)::DOUBLE), {NB_ROUND}) AS contrib
    FROM te_tok te CROSS JOIN classes c
    LEFT JOIN counts k ON k.cls = c.cls AND k.tok = te.tok
),
per_class AS (
    SELECT doc_id, true_lang, cls,
           round(any_value(ln_prior)
                 + list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                            list_sort(list(contrib))),
                               (a, x) -> a + x), 6) AS score
    FROM scored_tok GROUP BY 1, 2, 3
),
ranked AS (
    SELECT doc_id, true_lang, cls, score,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, cls ASC) AS rn
    FROM per_class
)
SELECT doc_id, true_lang, cls AS pred_lang, score
FROM ranked WHERE rn = 1
"""

# ------------------------------------------------------------ Viterbi --

MILLI = 10**6  # ln → integer milli-nat scale

# 2-state HMM: 0 = casual, 1 = engaged (literal model, shared by both
# engines as exact integers)
_PI = [0.7, 0.3]
_T = [[0.8, 0.2], [0.3, 0.7]]
_E = {
    "view": [0.45, 0.15],
    "click": [0.35, 0.25],
    "signup": [0.05, 0.15],
    "purchase": [0.05, 0.40],
    "error": [0.10, 0.05],
}


def _mn(p: float) -> int:
    return round(math.log(p) * MILLI)


PI_I = [_mn(p) for p in _PI]
T_I = [[_mn(p) for p in row] for row in _T]
E_I = {k: [_mn(p) for p in v] for k, v in _E.items()}
E_UNK = [-20 * MILLI, -20 * MILLI]  # unseen event type


def _emit(obs: Column, state: int) -> Column:
    expr = F.lit(E_UNK[state]).cast("long")
    for k, v in sorted(E_I.items()):
        expr = F.when(obs == k, F.lit(v[state]).cast("long")).otherwise(expr)
    return expr


def q_viterbi_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Viterbi decode of the chronological event-type sequence
    under the literal 2-state HMM — exact int64 milli-nat DP; emits
    (user_id, n_events, best_score, path as '0,1,...')."""
    e = table(spark, sf_dir, "events")
    seq = e.groupBy("user_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ).alias("obs"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    first = F.element_at("obs", 1)
    rest = F.slice(
        F.col("obs"), 2, F.greatest(F.size("obs") - 1, F.lit(0))
    )
    init = F.array(
        F.struct(
            (F.lit(PI_I[0]).cast("long") + _emit(first, 0)).alias("score"),
            F.array(F.lit(0)).alias("path"),
        ),
        F.struct(
            (F.lit(PI_I[1]).cast("long") + _emit(first, 1)).alias("score"),
            F.array(F.lit(1)).alias("path"),
        ),
    )

    def step(acc, obs):
        def new_state(s: int):
            c0 = F.element_at(acc, 1)["score"] + F.lit(T_I[0][s]).cast("long")
            c1 = F.element_at(acc, 2)["score"] + F.lit(T_I[1][s]).cast("long")
            take1 = c1 > c0  # tie → state 0
            best = F.when(take1, c1).otherwise(c0)
            path = F.when(take1, F.element_at(acc, 2)["path"]).otherwise(
                F.element_at(acc, 1)["path"]
            )
            return F.struct(
                (best + _emit(obs, s)).alias("score"),
                F.concat(path, F.array(F.lit(s))).alias("path"),
            )

        return F.array(new_state(0), new_state(1))

    state = F.aggregate(rest, init, step)
    s0 = F.element_at(state, 1)
    s1 = F.element_at(state, 2)
    win1 = s1["score"] > s0["score"]
    return seq.select(
        "user_id", "n_events",
        F.when(win1, s1["score"]).otherwise(s0["score"]).alias("best_score"),
        F.concat_ws(
            ",",
            F.transform(
                F.when(win1, s1["path"]).otherwise(s0["path"]),
                lambda x: x.cast("string"),
            ),
        ).alias("path"),
    )


# The oracle fold cannot close over the per-step observation string
# (list_reduce lambdas see only (acc, x)), so observations ride INSIDE
# the element as an integer code in the score slot of an otherwise-empty
# state pair; emissions look up by code.
OBS_CODE = {k: i for i, k in enumerate(sorted(E_I))}


def _emit_sql_by_code(code_expr: str, state: int) -> str:
    whens = " ".join(
        f"WHEN {code_expr} = {OBS_CODE[k]} THEN CAST({v[state]} AS BIGINT)"
        for k, v in sorted(E_I.items())
    )
    return f"(CASE {whens} ELSE CAST({E_UNK[state]} AS BIGINT) END)"


def _obs_code_sql(obs_expr: str) -> str:
    whens = " ".join(
        f"WHEN {obs_expr} = '{k}' THEN CAST({c} AS BIGINT)"
        for k, c in sorted(OBS_CODE.items())
    )
    return f"(CASE {whens} ELSE CAST(-1 AS BIGINT) END)"


def _vit_step_sql(state: int) -> str:
    """New struct for target `state` given acc and the code in x[1].score."""
    c0 = f"acc[1].score + {T_I[0][state]}"
    c1 = f"acc[2].score + {T_I[1][state]}"
    return (
        f"{{'score': CASE WHEN {c1} > {c0} THEN {c1} ELSE {c0} END "
        f"+ {_emit_sql_by_code('x[1].score', state)}, "
        f"'path': list_append(CASE WHEN {c1} > {c0} "
        f"THEN acc[2].path ELSE acc[1].path END, {state})}}"
    )


_VITERBI_SQL = f"""
WITH seq AS (
    SELECT user_id,
           list_transform(
               list_sort(list({{'ts': ts, 'event_id': event_id,
                                'event_type': event_type}})),
               s -> s.event_type) AS obs,
           count(*)::BIGINT AS n_events
    FROM events GROUP BY user_id
),
dp AS (
    SELECT user_id, n_events,
           list_reduce(
               list_prepend(
                   [{{'score': CAST({PI_I[0]} AS BIGINT)
                          + {_emit_sql_by_code(_obs_code_sql('(obs[1])'), 0)},
                      'path': CAST([0] AS BIGINT[])}},
                    {{'score': CAST({PI_I[1]} AS BIGINT)
                          + {_emit_sql_by_code(_obs_code_sql('(obs[1])'), 1)},
                      'path': CAST([1] AS BIGINT[])}}],
                   list_transform(obs[2:],
                       o -> [{{'score': {_obs_code_sql('o')},
                               'path': CAST([] AS BIGINT[])}},
                             {{'score': CAST(0 AS BIGINT),
                               'path': CAST([] AS BIGINT[])}}])),
               (acc, x) -> [{_vit_step_sql(0)}, {_vit_step_sql(1)}]
           ) AS fin
    FROM seq
)
SELECT user_id, n_events,
       CASE WHEN fin[2].score > fin[1].score
            THEN fin[2].score ELSE fin[1].score END AS best_score,
       array_to_string(
           CASE WHEN fin[2].score > fin[1].score
                THEN fin[2].path ELSE fin[1].path END, ',') AS path
FROM dp
"""


QUERIES = {
    "naive_bayes": q_naive_bayes,
    "viterbi_path": q_viterbi_path,
}

ORACLES = {
    "naive_bayes": _NB_SQL,
    "viterbi_path": _VITERBI_SQL,
}
