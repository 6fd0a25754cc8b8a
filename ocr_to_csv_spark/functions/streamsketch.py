"""Per-stream sketches, batch 142: DGIM sliding-window bit counting
(capped-level variant) and the Misra–Gries (space-saving) frequent-
element sketch, each run over every user's chronological event stream
— the two classic O(log W)/O(k) streaming summaries next to cms_freq
/ hll_distinct / quantile_sketch, here exercised per key so the fold
is a bounded in-row expression.

Scale design (100 TB):
- Streams assemble like viterbi_path/hmm_forward: ONE user keyed
  aggregate; the sketches are sequential folds INSIDE the row, state
  O(levels)/O(k) — at production scale the same folds run inside
  applyInPandasWithState per key over an unbounded stream; the batch
  shape here proves the transition logic.
- ``dgim_count`` (Datar–Gionis–Indyk–Motwani): buckets packed as
  size·2²⁰ + pos, newest first; each step expires buckets beyond the
  W=16 window, inserts a size-1 bucket on a purchase bit, then
  cascades merges for levels 1 and 2 (LEVELS capped so the generated
  expression stays polynomial — each level rebuilds the list as
  A(sz<s) ++ B[:-2] ++ merged(2s, newer-of-two-oldest pos) ++ C(sz>s),
  valid because DGIM keeps sizes non-decreasing with age). Estimate =
  Σ sizes − ⌊oldest/2⌋; with the level cap the absolute error is
  ≤ max_size/2 = 2, pinned against the exact windowed count.
- ``space_saving`` (Misra–Gries, k=3): counters packed code·2²⁰ +
  count; hit → increment, room → insert, full → decrement-all and
  drop zeros. The MG guarantee — any element with true frequency
  > n/(k+1) survives in the sketch — is pinned per user against
  exact counts.

Reference parity: no sketch layer in the reference; extends cms_freq,
hll_distinct, ams_f2, priority_sample_est, quantile_sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .hmmops import _seq

P2 = 1 << 20
DGIM_W = 16
DGIM_LEVELS = (1, 2)  # merge cascade levels (max bucket size 4)
MG_K = 3
# stable event-type codes
TYPE_CODES = {"click": 0, "error": 1, "purchase": 2, "signup": 3, "view": 4}


def _sz(x: Column) -> Column:
    return F.floor(x / P2).cast("long")


def _pos(x: Column) -> Column:
    return x % P2


def q_dgim_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped-level DGIM estimate of purchases in the last W events
    per user (module doc): (user_id, n_events, n_buckets, est, actual)."""
    s = _seq(spark, sf_dir)
    bits = F.transform(
        F.col("obs"), lambda o: (o == "purchase").cast("long")
    )
    n = F.size(bits)

    def step(acc, i):
        kept = F.filter(acc, lambda x: _pos(x) > i - DGIM_W)
        base = F.concat(F.array(F.lit(P2).cast("long") + i), kept)
        cur = base
        for sv in DGIM_LEVELS:
            a = F.filter(cur, lambda x: _sz(x) < sv)
            b = F.filter(cur, lambda x: _sz(x) == sv)
            c = F.filter(cur, lambda x: _sz(x) > sv)
            nb = F.size(b)
            merged = (
                F.lit(2 * sv * P2).cast("long")
                + _pos(F.element_at(b, -2))
            )
            cur = F.when(
                nb >= 3,
                F.concat(a, F.slice(b, 1, nb - 2), F.array(merged), c),
            ).otherwise(cur)
        return F.when(
            F.element_at(bits, i.cast("int")) == 1, cur
        ).otherwise(kept)

    empty = F.array().cast("array<bigint>")
    fin = F.aggregate(F.sequence(F.lit(1), n), empty, step)
    tot = F.aggregate(
        fin, F.lit(0).cast("long"), lambda acc, x: acc + _sz(x)
    )
    oldest = F.element_at(fin, -1)
    est = F.when(
        F.size(fin) > 0, tot - F.floor(_sz(oldest) / 2).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    lastw = F.slice(
        bits, F.greatest(n - DGIM_W + 1, F.lit(1)), F.least(n, F.lit(DGIM_W))
    )
    actual = F.aggregate(
        lastw, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return s.select(
        "user_id",
        "n_events",
        F.size(fin).cast("long").alias("n_buckets"),
        est.alias("est"),
        actual.alias("actual"),
    ).orderBy("user_id")


def q_space_saving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra–Gries k=3 sketch per user (module doc): surviving
    counters as 'code:residual' (sorted by code), counter count."""
    s = _seq(spark, sf_dir)
    code = lambda o: F.coalesce(  # noqa: E731
        *[
            F.when(o == t, F.lit(v).cast("long"))
            for t, v in sorted(TYPE_CODES.items())
        ],
        F.lit(9).cast("long"),
    )
    codes = F.transform(F.col("obs"), code)

    def step(acc, c):
        hit = F.exists(acc, lambda x: _sz(x) == c)
        inc = F.transform(
            acc, lambda x: F.when(_sz(x) == c, x + 1).otherwise(x)
        )
        ins = F.concat(acc, F.array(c * P2 + 1))
        dec = F.filter(
            F.transform(acc, lambda x: x - 1), lambda x: _pos(x) > 0
        )
        return F.when(hit, inc).otherwise(
            F.when(F.size(acc) < MG_K, ins).otherwise(dec)
        )

    empty = F.array().cast("array<bigint>")
    fin = F.aggregate(codes, empty, step)
    rendered = F.array_join(
        F.transform(
            F.array_sort(fin),
            lambda x: F.concat_ws(
                ":", _sz(x).cast("string"), _pos(x).cast("string")
            ),
        ),
        ",",
    )
    return s.select(
        "user_id",
        "n_events",
        F.size(fin).cast("long").alias("n_counters"),
        rendered.alias("counters"),
    ).orderBy("user_id")


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
)
"""


def _dgim_sql() -> str:
    expire = f"list_filter(acc, x -> x % {P2} > iv[1] - {DGIM_W})"
    base = f"list_concat([({P2} + iv[1])::BIGINT], {expire})"
    cur = base
    for sv in DGIM_LEVELS:
        a = f"list_filter({cur}, x -> x // {P2} < {sv})"
        b = f"list_filter({cur}, x -> x // {P2} = {sv})"
        c = f"list_filter({cur}, x -> x // {P2} > {sv})"
        merged = f"({2 * sv * P2} + ({b})[-2] % {P2})::BIGINT"
        cur = (
            f"CASE WHEN len({b}) >= 3 THEN "
            f"list_concat(list_concat(list_concat({a}, "
            f"list_slice({b}, 1, len({b}) - 2)), [{merged}]), {c}) "
            f"ELSE {cur} END"
        )
    step = f"CASE WHEN bits[iv[1]] = 1 THEN {cur} ELSE {expire} END"
    return f"""
WITH {_SEQ_SQL},
bs AS (
    SELECT user_id, n_events,
           list_transform(obs,
               o -> (CASE WHEN o = 'purchase' THEN 1 ELSE 0 END)::BIGINT)
               AS bits
    FROM seq
),
folded AS (
    SELECT user_id, n_events, bits,
           list_reduce(
               list_prepend([]::BIGINT[],
                   list_transform(generate_series(1, len(bits)),
                                  i -> [i::BIGINT])),
               (acc, iv) -> {step}) AS fin
    FROM bs
)
SELECT user_id, n_events,
       len(fin)::BIGINT AS n_buckets,
       (CASE WHEN len(fin) > 0 THEN
           list_sum(list_transform(fin, x -> x // {P2}))
           - (fin[-1] // {P2}) // 2
        ELSE 0 END)::BIGINT AS est,
       coalesce(list_sum(list_slice(bits,
           greatest(len(bits) - {DGIM_W} + 1, 1), len(bits))), 0)::BIGINT
           AS actual
FROM folded
ORDER BY user_id
"""


def _mg_sql() -> str:
    codecase = "(CASE " + " ".join(
        f"WHEN o = '{t}' THEN {v}" for t, v in sorted(TYPE_CODES.items())
    ) + " ELSE 9 END)::BIGINT"
    step = (
        f"CASE WHEN len(list_filter(acc, x -> x // {P2} = cv[1])) > 0 "
        f"THEN list_transform(acc, x -> CASE WHEN x // {P2} = cv[1] "
        f"THEN x + 1 ELSE x END) "
        f"WHEN len(acc) < {MG_K} THEN list_append(acc, cv[1] * {P2} + 1) "
        f"ELSE list_filter(list_transform(acc, x -> x - 1), "
        f"x -> x % {P2} > 0) END"
    )
    return f"""
WITH {_SEQ_SQL},
cs AS (
    SELECT user_id, n_events,
           list_transform(obs, o -> {codecase}) AS codes
    FROM seq
),
folded AS (
    SELECT user_id, n_events,
           list_reduce(
               list_prepend([]::BIGINT[],
                   list_transform(codes, c -> [c])),
               (acc, cv) -> {step}) AS fin
    FROM cs
)
SELECT user_id, n_events,
       len(fin)::BIGINT AS n_counters,
       coalesce(array_to_string(list_transform(list_sort(fin),
           x -> (x // {P2})::VARCHAR || ':' || (x % {P2})::VARCHAR), ','),
           '') AS counters
FROM folded
ORDER BY user_id
"""


QUERIES = {
    "dgim_count": q_dgim_count,
    "space_saving": q_space_saving,
}

ORACLES = {
    "dgim_count": _dgim_sql(),
    "space_saving": _mg_sql(),
}
