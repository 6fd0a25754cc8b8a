"""Sequential drift detection, batch 172: the Page–Hinkley test over
the daily event series and DDM (Gama's Drift Detection Method) over
the quality-classifier error stream — the online change detectors
next to cusum_drift/changepoint (which are offline/batch), closing
the monitoring family.

Scale design (100 TB):
- ``page_hinkley``: per type, ONE fold over the zero-filled daily
  spine carrying [t, S (exact int), m_nano, min_nano, alarm_at]: the
  deviation x_t − S_t/t − δ is leaf-rounded to INTEGER nano per step
  (the running mean's rational is the only division), the cumulative
  m and its running minimum stay int64, and the alarm fires when
  m − min > λ·nano. First-alarm index or −1 per type.
- ``ddm``: the corpus-wide error stream (classifier keep vs lang
  label, doc_id order) folds once with [t, errors, pmin+smin tracker,
  warn_at, drift_at]: p_t and s_t = sqrt(p(1−p)/t) are nano-rounded
  per step so the warn (p+s > min(p+s at pmin) + 2·s_min) and drift
  (3·s_min) comparisons are integer. At 10¹² docs the same fold is
  the applyInPandasWithState per-model-shard monitor.

Reference parity: no monitoring layer in the reference; extends
cusum_drift, changepoint, psi_drift, sprt_decision, mase_backtest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .peakops import _FILLED_SQL, _filled_series
from .textops import QC_BIAS, QC_BUCKETS, _QC_W, _qc_weight
from .util import DUCK_TOKENS, hex32, table, tokens

NANO = 1_000_000_000
PH_DELTA_NANO = 0  # target-mean slack
PH_LAMBDA = 20  # alarm threshold in count units
MIN_LEN = 14


def q_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per type (module doc): (typ, n, alarm_at, ph_final_nano,
    ph_min_nano)."""
    s = _filled_series(spark, sf_dir).filter(F.size("xs") >= MIN_LEN)
    xs = F.col("xs")
    # acc = [t, S, m_nano, min_nano, alarm_at]
    init = F.array(*[F.lit(v).cast("long") for v in (0, 0, 0, 0, -1)])

    def step(acc, x):
        t = F.element_at(acc, 1) + 1
        s_ = F.element_at(acc, 2) + x
        dev = F.round(
            (
                x.cast("double")
                - s_.cast("double") / t.cast("double")
            )
            * NANO
        ).cast("long") - PH_DELTA_NANO
        m = F.element_at(acc, 3) + dev
        mn = F.least(F.element_at(acc, 4), m)
        fired = (
            (F.element_at(acc, 5) < 0)
            & (m - mn > PH_LAMBDA * NANO)
        )
        alarm = F.when(fired, t).otherwise(F.element_at(acc, 5))
        return F.array(t, s_, m, mn, alarm)

    fin = F.aggregate(xs, init, step)
    return s.select(
        "typ",
        F.size(xs).cast("long").alias("n"),
        F.element_at(fin, 5).alias("alarm_at"),
        F.element_at(fin, 3).alias("ph_final_nano"),
        F.element_at(fin, 4).alias("ph_min_nano"),
    ).orderBy("typ")


def q_ddm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (module doc): (n, n_errors, warn_at, drift_at,
    psmin_nano)."""
    d = table(spark, sf_dir, "documents", spread=True)
    toks = tokens(F.col("text"))
    score = F.aggregate(
        F.transform(toks, lambda t: _qc_weight(hex32(t) % QC_BUCKETS)),
        F.lit(QC_BIAS).cast("long"),
        lambda acc, x: acc + x,
    )
    errs = d.select(
        "doc_id",
        (
            (score > 0) != (F.col("lang") == "en")
        ).cast("long").alias("e"),
    )
    packed = errs.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "e"))),
            lambda s: s["e"],
        ).alias("es")
    )
    # acc = [t, errors, psmin_nano, smin_nano, warn_at, drift_at]
    big = 1 << 60
    init = F.array(
        *[F.lit(v).cast("long") for v in (0, 0, big, big, -1, -1)]
    )

    def step(acc, e):
        t = F.element_at(acc, 1) + 1
        ne = F.element_at(acc, 2) + e
        p = ne.cast("double") / t.cast("double")
        s_ = F.sqrt(p * (1 - p) / t.cast("double"))
        ps_nano = F.round((p + s_) * NANO).cast("long")
        s_nano = F.round(s_ * NANO).cast("long")
        better = ps_nano < F.element_at(acc, 3)
        psmin = F.when(better, ps_nano).otherwise(F.element_at(acc, 3))
        smin = F.when(better, s_nano).otherwise(F.element_at(acc, 4))
        warn = F.when(
            (F.element_at(acc, 5) < 0)
            & (ps_nano > psmin + 2 * smin),
            t,
        ).otherwise(F.element_at(acc, 5))
        drift = F.when(
            (F.element_at(acc, 6) < 0)
            & (ps_nano > psmin + 3 * smin),
            t,
        ).otherwise(F.element_at(acc, 6))
        return F.array(t, ne, psmin, smin, warn, drift)

    fin = F.aggregate(F.col("es"), init, step)
    return packed.select(
        F.element_at(fin, 1).alias("n"),
        F.element_at(fin, 2).alias("n_errors"),
        F.element_at(fin, 5).alias("warn_at"),
        F.element_at(fin, 6).alias("drift_at"),
        F.element_at(fin, 3).alias("psmin_nano"),
    )


_PH_STEP = (
    "[acc[1] + 1, acc[2] + xv[1], "
    "acc[3] + CAST(round((xv[1]::DOUBLE - (acc[2] + xv[1])::DOUBLE / "
    f"(acc[1] + 1)::DOUBLE) * {NANO}) AS BIGINT) - {PH_DELTA_NANO}, "
    "least(acc[4], acc[3] + CAST(round((xv[1]::DOUBLE - "
    "(acc[2] + xv[1])::DOUBLE / (acc[1] + 1)::DOUBLE) "
    f"* {NANO}) AS BIGINT) - {PH_DELTA_NANO}), "
    "CASE WHEN acc[5] < 0 AND "
    "(acc[3] + CAST(round((xv[1]::DOUBLE - (acc[2] + xv[1])::DOUBLE / "
    f"(acc[1] + 1)::DOUBLE) * {NANO}) AS BIGINT) - {PH_DELTA_NANO}) "
    "- least(acc[4], acc[3] + CAST(round((xv[1]::DOUBLE - "
    "(acc[2] + xv[1])::DOUBLE / (acc[1] + 1)::DOUBLE) "
    f"* {NANO}) AS BIGINT) - {PH_DELTA_NANO}) > {PH_LAMBDA}::BIGINT "
    f"* {NANO} "
    "THEN acc[1] + 1 ELSE acc[5] END]"
)

_PH_SQL = f"""
WITH s AS ({_FILLED_SQL})
SELECT typ, len(xs)::BIGINT AS n,
       fin[5]::BIGINT AS alarm_at,
       fin[3]::BIGINT AS ph_final_nano,
       fin[4]::BIGINT AS ph_min_nano
FROM (
    SELECT typ, xs,
           list_reduce(
               list_prepend([0::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT,
                             -1::BIGINT],
                   list_transform(xs, x -> [x::BIGINT])),
               (acc, xv) -> {_PH_STEP}) AS fin
    FROM s WHERE len(xs) >= {MIN_LEN}
)
ORDER BY typ
"""


def _ddm_sql() -> str:
    toks = DUCK_TOKENS.format(x="text")
    big = 1 << 60
    p = "((acc[2] + ev[1])::DOUBLE / (acc[1] + 1)::DOUBLE)"
    s_ = f"sqrt({p} * (1 - {p}) / (acc[1] + 1)::DOUBLE)"
    ps = f"CAST(round(({p} + {s_}) * {NANO}) AS BIGINT)"
    sn = f"CAST(round({s_} * {NANO}) AS BIGINT)"
    psmin = f"(CASE WHEN {ps} < acc[3] THEN {ps} ELSE acc[3] END)"
    smin = f"(CASE WHEN {ps} < acc[3] THEN {sn} ELSE acc[4] END)"
    step = (
        f"[acc[1] + 1, acc[2] + ev[1], {psmin}, {smin}, "
        f"CASE WHEN acc[5] < 0 AND {ps} > {psmin} + 2 * {smin} "
        f"THEN acc[1] + 1 ELSE acc[5] END, "
        f"CASE WHEN acc[6] < 0 AND {ps} > {psmin} + 3 * {smin} "
        f"THEN acc[1] + 1 ELSE acc[6] END]"
    )
    return f"""
WITH errs AS (
    SELECT doc_id,
           (CASE WHEN (({QC_BIAS} + coalesce(
               list_sum(list_transform({toks}, t -> {_QC_W})), 0)) > 0)
               <> (lang = 'en') THEN 1 ELSE 0 END)::BIGINT AS e
    FROM documents
),
packed AS (
    SELECT list_transform(
               list(struct_pack(doc_id := doc_id, e := e)
                    ORDER BY doc_id, e),
               s -> s.e) AS es
    FROM errs
),
folded AS (
    SELECT list_reduce(
               list_prepend([0::BIGINT, 0::BIGINT, {big}::BIGINT,
                             {big}::BIGINT, -1::BIGINT, -1::BIGINT],
                   list_transform(es, e -> [e])),
               (acc, ev) -> {step}) AS fin
    FROM packed
)
SELECT fin[1]::BIGINT AS n,
       fin[2]::BIGINT AS n_errors,
       fin[5]::BIGINT AS warn_at,
       fin[6]::BIGINT AS drift_at,
       fin[3]::BIGINT AS psmin_nano
FROM folded
"""


QUERIES = {
    "page_hinkley": q_page_hinkley,
    "ddm": q_ddm,
}

ORACLES = {
    "page_hinkley": _PH_SQL,
    "ddm": _ddm_sql(),
}
