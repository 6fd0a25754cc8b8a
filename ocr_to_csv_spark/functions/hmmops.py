"""HMM sum-product, batch 141: forward log-likelihood and
forward–backward smoothed decoding of the per-user event-type
sequence under the same literal 2-state HMM viterbi_path max-decodes —
the "how probable is this journey at all" and the per-step posterior
(local) decode next to the global Viterbi path.

Scale design (100 TB):
- Sequences assemble exactly like viterbi_path: ONE user keyed
  aggregate collecting the chronological event types; everything
  after is bounded in-row folds (sequences are per-user-bounded).
- Emission probabilities are precomputed per element as a
  [e0, e1] double pair by ONE map-side transform — the fold lambda
  then never needs to close over the observation (the viterbi
  oracle's code-in-element trick, but carrying the probabilities
  themselves).
- ``hmm_forward``: scaled forward recursion with the per-step
  normalizer c_t; the accumulator carries [α0, α1, ll] where ll adds
  round(ln(c_t)·1e9) per step — an integer-valued double, so the
  corpus-visible output (ll_nano, final posterior) is bit-stable
  across engines (fixed fold order, the power_iteration discipline).
- ``hmm_posterior``: two more folds build the flattened per-step α
  and (reversed) β pair arrays, each pair normalized per step —
  per-step scaling cancels inside each γ_t comparison, so the
  smoothed state is argmax(α_t·β_t) with a deterministic tie → 0.
  Emits the per-user smoothed-state-1 count; the test pins the
  textbook property that smoothed (local) decode and Viterbi
  (global) decode may disagree yet both stay within the sequence.

Reference parity: no sequence-model layer in the reference; extends
viterbi_path / markov_transitions / journey_entropy (mlops2, chainops).
"""

from __future__ import annotations


from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .mlops2 import _E, _PI, _T
from .util import table

P_UNK = 1e-9
NANO = 1_000_000_000


def _seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ).alias("obs"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def _eprobs(obs_col: Column) -> Column:
    """Per-element [e0, e1] emission-probability pairs."""

    def one(o, state):
        expr = F.lit(P_UNK)
        for k, v in sorted(_E.items()):
            expr = F.when(o == k, F.lit(v[state])).otherwise(expr)
        return expr

    return F.transform(obs_col, lambda o: F.array(one(o, 0), one(o, 1)))


def _fw_init(es: Column) -> Column:
    e = F.element_at(es, 1)
    i0 = F.lit(_PI[0]) * F.element_at(e, 1)
    i1 = F.lit(_PI[1]) * F.element_at(e, 2)
    c = i0 + i1
    return F.array(i0 / c, i1 / c, F.round(F.ln(c) * NANO))


def _fw_step(acc: Column, e: Column) -> Column:
    raw0 = (
        F.element_at(acc, 1) * F.lit(_T[0][0])
        + F.element_at(acc, 2) * F.lit(_T[1][0])
    ) * F.element_at(e, 1)
    raw1 = (
        F.element_at(acc, 1) * F.lit(_T[0][1])
        + F.element_at(acc, 2) * F.lit(_T[1][1])
    ) * F.element_at(e, 2)
    c = raw0 + raw1
    return F.array(
        raw0 / c, raw1 / c, F.element_at(acc, 3) + F.round(F.ln(c) * NANO)
    )


def q_hmm_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scaled forward pass per user (module doc): (user_id, n_events,
    ll_nano, a1_final)."""
    s = _seq(spark, sf_dir)
    es = _eprobs(F.col("obs"))
    rest = F.slice(es, 2, F.greatest(F.size(es) - 1, F.lit(0)))
    fin = F.aggregate(rest, _fw_init(es), _fw_step)
    return s.select(
        "user_id",
        "n_events",
        F.element_at(fin, 3).cast("long").alias("ll_nano"),
        F.round(F.element_at(fin, 2), 9).alias("a1_final"),
    ).orderBy("user_id")


def q_hmm_posterior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward–backward smoothed decode per user (module doc):
    (user_id, n_events, n_smooth1).

    The α/β recursions run in an Arrow-batched ``mapInPandas`` stage:
    building the flattened per-step pair arrays with Catalyst
    ``aggregate`` + ``concat`` folds (the previous form) is O(n²) array
    copying evaluated interpreted — 25 s at sf0.01 vs ~1 s here. The
    recursion is a linear recurrence (inherently sequential per user),
    so the honest scale shape is exactly this: sequences assemble with
    ONE keyed aggregate, each task decodes its own users with zero
    further shuffle, and only (user_id, n_events, n_smooth1) rows come
    back. Float-op ORDER inside the loop replicates the previous fold
    (and the DuckDB oracle) term-for-term, so results are bit-identical.
    """
    s = _seq(spark, sf_dir)
    emit = {k: (v[0], v[1]) for k, v in _E.items()}
    t00, t01 = _T[0]
    t10, t11 = _T[1]
    pi0, pi1 = _PI

    def fb(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for uid, obs, n in zip(
                pdf["user_id"], pdf["obs"], pdf["n_events"]
            ):
                es = [emit.get(o, (P_UNK, P_UNK)) for o in obs]
                f0, f1 = es[0]
                i0 = pi0 * f0
                i1 = pi1 * f1
                c = i0 + i1
                a0, a1 = i0 / c, i1 / c
                alphas = [(a0, a1)]
                for f0, f1 in es[1:]:
                    raw0 = (a0 * t00 + a1 * t10) * f0
                    raw1 = (a0 * t01 + a1 * t11) * f1
                    c = raw0 + raw1
                    a0, a1 = raw0 / c, raw1 / c
                    alphas.append((a0, a1))
                b0 = b1 = 1.0
                betas = [(b0, b1)]  # betas[k] = β_{n-k}
                for f0, f1 in reversed(es[1:]):
                    r0 = t00 * f0 * b0 + t01 * f1 * b1
                    r1 = t10 * f0 * b0 + t11 * f1 * b1
                    c = r0 + r1
                    b0, b1 = r0 / c, r1 / c
                    betas.append((b0, b1))
                nn = len(es)
                hits = 0
                for t0_ in range(nn):
                    a0, a1 = alphas[t0_]
                    b0, b1 = betas[nn - 1 - t0_]
                    if a1 * b1 > a0 * b0:
                        hits += 1
                out.append((int(uid), int(n), hits))
            yield pd.DataFrame(
                out, columns=["user_id", "n_events", "n_smooth1"]
            )

    return s.mapInPandas(
        fb, "user_id bigint, n_events bigint, n_smooth1 bigint"
    ).orderBy("user_id")


def _e_sql(o: str, state: int) -> str:
    expr = repr(P_UNK)
    for k, v in sorted(_E.items()):
        expr = f"CASE WHEN {o} = '{k}' THEN {v[state]} ELSE {expr} END"
    return expr


_SEQ_SQL = """
seq AS (
    SELECT user_id,
           list_transform(
               list(struct_pack(ts := ts, event_id := event_id,
                                event_type := event_type)
                    ORDER BY ts, event_id, event_type),
               s -> s.event_type) AS obs,
           count(*)::BIGINT AS n_events
    FROM events GROUP BY user_id
),
ep AS (
    SELECT user_id, n_events,
           list_transform(obs, o -> [{e0}, {e1}]) AS es
    FROM seq
)
""".format(e0=_e_sql("o", 0), e1=_e_sql("o", 1))

_FW_STEP = (
    "[((acc[1] * {t00} + acc[2] * {t10}) * e[1])"
    " / ((acc[1] * {t00} + acc[2] * {t10}) * e[1]"
    "  + (acc[1] * {t01} + acc[2] * {t11}) * e[2]),"
    " ((acc[1] * {t01} + acc[2] * {t11}) * e[2])"
    " / ((acc[1] * {t00} + acc[2] * {t10}) * e[1]"
    "  + (acc[1] * {t01} + acc[2] * {t11}) * e[2]),"
    " acc[3] + round(ln((acc[1] * {t00} + acc[2] * {t10}) * e[1]"
    "  + (acc[1] * {t01} + acc[2] * {t11}) * e[2]) * {nano})]"
).format(
    t00=_T[0][0], t01=_T[0][1], t10=_T[1][0], t11=_T[1][1], nano=NANO
)

_FW_INIT = (
    "[{p0} * es[1][1] / ({p0} * es[1][1] + {p1} * es[1][2]),"
    " {p1} * es[1][2] / ({p0} * es[1][1] + {p1} * es[1][2]),"
    " round(ln({p0} * es[1][1] + {p1} * es[1][2]) * {nano})]"
).format(p0=_PI[0], p1=_PI[1], nano=NANO)

_FORWARD_SQL = f"""
WITH {_SEQ_SQL}
SELECT user_id, n_events,
       fin[3]::BIGINT AS ll_nano,
       round(fin[2], 9) AS a1_final
FROM (
    SELECT user_id, n_events,
           list_reduce(
               list_prepend({_FW_INIT},
                   list_slice(es, 2, len(es))),
               (acc, e) -> {_FW_STEP}) AS fin
    FROM ep
)
ORDER BY user_id
"""

_A_STEP = (
    "list_concat(acc, "
    "[((acc[-2] * {t00} + acc[-1] * {t10}) * e[1])"
    " / ((acc[-2] * {t00} + acc[-1] * {t10}) * e[1]"
    "  + (acc[-2] * {t01} + acc[-1] * {t11}) * e[2]),"
    " ((acc[-2] * {t01} + acc[-1] * {t11}) * e[2])"
    " / ((acc[-2] * {t00} + acc[-1] * {t10}) * e[1]"
    "  + (acc[-2] * {t01} + acc[-1] * {t11}) * e[2])])"
).format(t00=_T[0][0], t01=_T[0][1], t10=_T[1][0], t11=_T[1][1])

_A_INIT = (
    "[{p0} * es[1][1] / ({p0} * es[1][1] + {p1} * es[1][2]),"
    " {p1} * es[1][2] / ({p0} * es[1][1] + {p1} * es[1][2])]"
).format(p0=_PI[0], p1=_PI[1])

_B_STEP = (
    "list_concat(acc, "
    "[({t00} * e[1] * acc[-2] + {t01} * e[2] * acc[-1])"
    " / (({t00} * e[1] * acc[-2] + {t01} * e[2] * acc[-1])"
    "  + ({t10} * e[1] * acc[-2] + {t11} * e[2] * acc[-1])),"
    " ({t10} * e[1] * acc[-2] + {t11} * e[2] * acc[-1])"
    " / (({t00} * e[1] * acc[-2] + {t01} * e[2] * acc[-1])"
    "  + ({t10} * e[1] * acc[-2] + {t11} * e[2] * acc[-1]))])"
).format(t00=_T[0][0], t01=_T[0][1], t10=_T[1][0], t11=_T[1][1])

_POSTERIOR_SQL = f"""
WITH {_SEQ_SQL}
SELECT user_id, n_events,
       list_sum(list_transform(generate_series(1, len(es)),
           t -> CASE WHEN al[2*t] * be[2*(len(es)-t)+2]
                        > al[2*t-1] * be[2*(len(es)-t)+1]
                     THEN 1 ELSE 0 END))::BIGINT AS n_smooth1
FROM (
    SELECT user_id, n_events, es,
           list_reduce(
               list_prepend({_A_INIT}, list_slice(es, 2, len(es))),
               (acc, e) -> {_A_STEP}) AS al,
           list_reduce(
               list_prepend([1.0::DOUBLE, 1.0::DOUBLE],
                   list_reverse(list_slice(es, 2, len(es)))),
               (acc, e) -> {_B_STEP}) AS be
    FROM ep
)
ORDER BY user_id
"""

QUERIES = {
    "hmm_forward": q_hmm_forward,
    "hmm_posterior": q_hmm_posterior,
}

ORACLES = {
    "hmm_forward": _FORWARD_SQL,
    "hmm_posterior": _POSTERIOR_SQL,
}
