"""Online-eval + planner-stats operators, batch 117: team-draft
interleaving of two retrieval rankers under a deterministic click
model, and histogram-based selectivity estimation audited against
actual counts — the online-experiment side of ranking evaluation
(ndcg/mrr/pr_at_k are offline) and the optimizer-statistics audit a
query planner runs before trusting its cardinality model.

Scale design (100 TB):
- ``team_draft``: candidate scoring is one map-side explode of the
  5-term literal query panel against the token membership test, and
  each ranker's top-K is a WindowGroupLimit (rank ≤ 6) — the topk
  discipline. After that, BOTH ranked lists collapse to one array row
  per query (panel-sized), and the entire draft — alternating picks,
  duplicate skipping, tie preference by query parity — is a bounded
  fold over 2K steps INSIDE that row, with picks packed as
  doc_id·2+team int64s (the in-row bounded-DP discipline). Clicks
  (doc_id % 3 == 0, the deterministic stand-in for a click log) and
  the per-query winner are array expressions. Nothing after the top-K
  windows exceeds panel cardinality.
- ``selectivity_est``: the histogram is ONE keyed agg over the
  bucketed scan (B=20 equi-width integer buckets; the 1-row min/max
  agg cross is the allowlisted stats tier); the 5-range predicate
  panel is a broadcast literal crossed only against the 20-row
  histogram. Estimates use uniform-within-bucket interpolation in
  EXACT integers (overlap·count numerator over the bucket width);
  actuals come from one map-side panel explode + keyed agg over the
  same scan. Output is panel-sized; the audit's |est − actual| is the
  number the layout/stats advisor family (layout_advisor,
  join_card_est, manifest_prune) acts on.

Reference parity: no eval/planner layer in the reference;
builder-brief analytics extensions of the evalops + planops families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import DUCK_TOKENS, table, tokens

TD_TERMS = ["scan", "join", "window", "hash", "merge"]
TD_K = 6  # top-K per ranker entering the draft
SEL_B = 20  # histogram buckets
# predicate ranges as percent of the [lo, hi+1) value domain
SEL_PREDS = [(1, 0, 10), (2, 10, 25), (3, 25, 50), (4, 50, 90), (5, 90, 100)]


def _ranked_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(qid, term, la, lb): per query, ranker A's top-K doc_ids by term
    frequency and ranker B's by document length (module doc)."""
    d = table(spark, sf_dir, "documents", spread=True)
    panel = spark.createDataFrame(
        list(enumerate(TD_TERMS)), "qid long, term string"
    )
    toks = tokens(F.col("text"))
    cand = (
        d.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_chars").cast("long").alias("n_chars"),
            toks.alias("toks"),
        )
        .join(F.broadcast(panel))
        .select(
            "qid",
            "term",
            "doc_id",
            "n_chars",
            F.size(F.filter(F.col("toks"), lambda t: t == F.col("term"))).alias(
                "tf"
            ),
        )
        .filter(F.col("tf") > 0)
    )
    wa = Window.partitionBy("qid").orderBy(F.desc("tf"), F.asc("doc_id"))
    wb = Window.partitionBy("qid").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    ranked = cand.select(
        "qid",
        "term",
        "doc_id",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"),
    )
    la = F.transform(
        F.sort_array(
            F.collect_list(
                F.when(F.col("ra") <= TD_K, F.struct("ra", "doc_id"))
            )
        ),
        lambda s: s["doc_id"],
    )
    lb = F.transform(
        F.sort_array(
            F.collect_list(
                F.when(F.col("rb") <= TD_K, F.struct("rb", "doc_id"))
            )
        ),
        lambda s: s["doc_id"],
    )
    return ranked.groupBy("qid", "term").agg(la.alias("la"), lb.alias("lb"))


def q_team_draft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Team-draft interleaving outcome per query (module doc)."""
    r = _ranked_lists(spark, sf_dir)
    la, lb = F.col("la"), F.col("lb")
    a_pref = F.col("qid") % 2 == 0  # tie-break preference
    empty = F.array().cast("array<bigint>")

    def step(acc, _):
        picked = F.transform(acc, lambda e: F.shiftright(e, 1))
        n_a = F.size(F.filter(acc, lambda e: e % 2 == 0))
        n_b = F.size(acc) - n_a
        cand_a = F.get(
            F.filter(la, lambda x: ~F.array_contains(picked, x)), 0
        )
        cand_b = F.get(
            F.filter(lb, lambda x: ~F.array_contains(picked, x)), 0
        )
        pick_a = (n_a < n_b) | ((n_a == n_b) & a_pref)
        chosen = F.when(
            pick_a,
            F.coalesce(cand_a * 2, cand_b * 2 + 1),
        ).otherwise(F.coalesce(cand_b * 2 + 1, cand_a * 2))
        return F.when(chosen.isNull(), acc).otherwise(
            F.concat(acc, F.array(chosen.cast("long")))
        )

    inter = F.aggregate(F.sequence(F.lit(1), F.lit(2 * TD_K)), empty, step)
    clicked = lambda e: F.shiftright(e, 1) % 3 == 0  # noqa: E731
    out = r.select(
        "qid",
        "term",
        inter.alias("acc"),
    ).select(
        "qid",
        "term",
        F.size("acc").cast("long").alias("n_shown"),
        F.size(
            F.filter(F.col("acc"), lambda e: (e % 2 == 0) & clicked(e))
        ).cast("long").alias("clicks_a"),
        F.size(
            F.filter(F.col("acc"), lambda e: (e % 2 == 1) & clicked(e))
        ).cast("long").alias("clicks_b"),
    )
    winner = (
        F.when(F.col("clicks_a") > F.col("clicks_b"), F.lit("A"))
        .when(F.col("clicks_a") < F.col("clicks_b"), F.lit("B"))
        .otherwise(F.lit("tie"))
    )
    return out.select(
        "qid", "term", "n_shown", "clicks_a", "clicks_b", winner.alias("winner")
    ).orderBy("qid")


def _panel_sql() -> str:
    rows = ", ".join(f"({i}, '{t}')" for i, t in enumerate(TD_TERMS))
    return f"SELECT * FROM (VALUES {rows}) AS t(qid, term)"


_TOKS = DUCK_TOKENS.format(x="text")

_TD_SQL = f"""
WITH panel AS ({_panel_sql()}),
cand AS (
    SELECT p.qid::BIGINT AS qid, p.term, d.doc_id::BIGINT AS doc_id,
           d.n_chars::BIGINT AS n_chars,
           len(list_filter({_TOKS}, t -> t = p.term))::BIGINT AS tf
    FROM documents d CROSS JOIN panel p
),
ranked AS (
    SELECT qid, term, doc_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY tf DESC, doc_id ASC) AS ra,
           row_number() OVER (PARTITION BY qid
                              ORDER BY n_chars DESC, doc_id ASC) AS rb
    FROM cand WHERE tf > 0
),
lists AS (
    SELECT qid, term,
           list(doc_id ORDER BY ra) FILTER (ra <= {TD_K}) AS la,
           list(doc_id ORDER BY rb) FILTER (rb <= {TD_K}) AS lb
    FROM ranked GROUP BY qid, term
),
drafted AS (
    SELECT qid, term,
           list_reduce(
               list_prepend(CAST([] AS BIGINT[]),
                            list_transform(generate_series(1, {2 * TD_K}),
                                           x -> CAST([x] AS BIGINT[]))),
               (acc, stepl) -> CASE
                   WHEN coalesce(
                            list_filter(la, x -> NOT list_contains(
                                list_transform(acc, e -> e >> 1), x))[1] * 2,
                            list_filter(lb, x -> NOT list_contains(
                                list_transform(acc, e -> e >> 1), x))[1] * 2 + 1
                        ) IS NULL THEN acc
                   WHEN (len(list_filter(acc, e -> e % 2 = 0))
                         < len(acc) - len(list_filter(acc, e -> e % 2 = 0)))
                        OR (len(list_filter(acc, e -> e % 2 = 0))
                            = len(acc) - len(list_filter(acc, e -> e % 2 = 0))
                            AND qid % 2 = 0)
                   THEN list_append(acc, coalesce(
                        list_filter(la, x -> NOT list_contains(
                            list_transform(acc, e -> e >> 1), x))[1] * 2,
                        list_filter(lb, x -> NOT list_contains(
                            list_transform(acc, e -> e >> 1), x))[1] * 2 + 1))
                   ELSE list_append(acc, coalesce(
                        list_filter(lb, x -> NOT list_contains(
                            list_transform(acc, e -> e >> 1), x))[1] * 2 + 1,
                        list_filter(la, x -> NOT list_contains(
                            list_transform(acc, e -> e >> 1), x))[1] * 2))
               END
           ) AS acc
    FROM lists
),
scored AS (
    SELECT qid, term, len(acc)::BIGINT AS n_shown,
           len(list_filter(acc, e -> e % 2 = 0 AND (e >> 1) % 3 = 0))::BIGINT
               AS clicks_a,
           len(list_filter(acc, e -> e % 2 = 1 AND (e >> 1) % 3 = 0))::BIGINT
               AS clicks_b
    FROM drafted
)
SELECT qid, term, n_shown, clicks_a, clicks_b,
       CASE WHEN clicks_a > clicks_b THEN 'A'
            WHEN clicks_a < clicks_b THEN 'B'
            ELSE 'tie' END AS winner
FROM scored
ORDER BY qid
"""


def q_selectivity_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram selectivity estimates vs actual counts for the literal
    range-predicate panel (module doc)."""
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    vals = o.select(cents.alias("v"))
    mm = vals.agg(
        F.min("v").alias("lo"), (F.max("v") + 1).alias("hi1")
    )
    # bucket width W = ceil((hi1-lo)/B) via integer arithmetic
    binfo = mm.select(
        "lo", "hi1",
        F.expr(f"cast((hi1 - lo + {SEL_B} - 1) div {SEL_B} as bigint)").alias(
            "w"
        ),
    )
    hist = (
        vals.crossJoin(F.broadcast(binfo))
        .select(F.expr("cast((v - lo) div w as bigint)").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    panel = spark.createDataFrame(
        SEL_PREDS, "pred_id long, pct_lo long, pct_hi long"
    )
    preds = panel.crossJoin(F.broadcast(binfo)).select(
        "pred_id",
        (
            F.col("lo")
            + F.expr("cast((hi1 - lo) * pct_lo div 100 as bigint)")
        ).alias("p_lo"),
        (
            F.col("lo")
            + F.expr("cast((hi1 - lo) * pct_hi div 100 as bigint)")
        ).alias("p_hi"),
        "lo",
        "w",
    )
    # overlap of [p_lo, p_hi) with bucket b = [lo + b·w, lo + (b+1)·w)
    j = preds.crossJoin(F.broadcast(hist))
    ov = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("p_hi"), F.col("lo") + (F.col("b") + 1) * F.col("w"))
        - F.greatest(F.col("p_lo"), F.col("lo") + F.col("b") * F.col("w")),
    )
    est = j.groupBy("pred_id", "p_lo", "p_hi", "w").agg(
        F.sum(ov * F.col("cnt")).alias("est_num")
    )
    actual = (
        vals.crossJoin(F.broadcast(preds.select("pred_id", "p_lo", "p_hi")))
        .filter((F.col("v") >= F.col("p_lo")) & (F.col("v") < F.col("p_hi")))
        .groupBy("pred_id")
        .agg(F.count(F.lit(1)).alias("actual_rows"))
    )
    out = est.join(actual, "pred_id", "left").select(
        "pred_id",
        "p_lo",
        "p_hi",
        F.expr("cast(est_num div w as bigint)").alias("est_rows"),
        F.coalesce("actual_rows", F.lit(0)).cast("long").alias("actual_rows"),
    )
    return out.select(
        "pred_id", "p_lo", "p_hi", "est_rows", "actual_rows",
        F.abs(F.col("est_rows") - F.col("actual_rows")).cast("long").alias(
            "abs_err"
        ),
    ).orderBy("pred_id")


def _sel_panel_sql() -> str:
    rows = ", ".join(f"({i}, {a}, {b})" for i, a, b in SEL_PREDS)
    return f"SELECT * FROM (VALUES {rows}) AS t(pred_id, pct_lo, pct_hi)"


_SEL_SQL = f"""
WITH vals AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders
),
mm AS (
    SELECT min(v) AS lo, max(v) + 1 AS hi1,
           (max(v) + 1 - min(v) + {SEL_B} - 1) // {SEL_B} AS w
    FROM vals
),
hist AS (
    SELECT (v - (SELECT lo FROM mm)) // (SELECT w FROM mm) AS b,
           count(*)::BIGINT AS cnt
    FROM vals GROUP BY 1
),
panel AS ({_sel_panel_sql()}),
preds AS (
    SELECT pred_id::BIGINT AS pred_id,
           (SELECT lo FROM mm)
             + ((SELECT hi1 FROM mm) - (SELECT lo FROM mm)) * pct_lo // 100
               AS p_lo,
           (SELECT lo FROM mm)
             + ((SELECT hi1 FROM mm) - (SELECT lo FROM mm)) * pct_hi // 100
               AS p_hi
    FROM panel
),
est AS (
    SELECT p.pred_id, p.p_lo, p.p_hi,
           sum(greatest(0,
               least(p.p_hi, (SELECT lo FROM mm) + (h.b + 1) * (SELECT w FROM mm))
               - greatest(p.p_lo, (SELECT lo FROM mm) + h.b * (SELECT w FROM mm))
           ) * h.cnt)::BIGINT AS est_num
    FROM preds p CROSS JOIN hist h
    GROUP BY p.pred_id, p.p_lo, p.p_hi
),
actual AS (
    SELECT p.pred_id, count(*)::BIGINT AS actual_rows
    FROM vals v JOIN preds p ON v.v >= p.p_lo AND v.v < p.p_hi
    GROUP BY p.pred_id
)
SELECT e.pred_id, e.p_lo::BIGINT AS p_lo, e.p_hi::BIGINT AS p_hi,
       (e.est_num // (SELECT w FROM mm))::BIGINT AS est_rows,
       coalesce(a.actual_rows, 0)::BIGINT AS actual_rows,
       abs(e.est_num // (SELECT w FROM mm)
           - coalesce(a.actual_rows, 0))::BIGINT AS abs_err
FROM est e LEFT JOIN actual a USING (pred_id)
ORDER BY e.pred_id
"""


QUERIES = {
    "team_draft": q_team_draft,
    "selectivity_est": q_selectivity_est,
}

ORACLES = {
    "team_draft": _TD_SQL,
    "selectivity_est": _SEL_SQL,
}
