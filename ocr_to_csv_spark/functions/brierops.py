"""Forecast audit + geometry, batch 140: Murphy decomposition of the
Brier score for the hashed quality classifier, and the classic
closest-pair problem by grid bucketing — the "is the model sharp or
just calibrated?" readout next to calibration_bins/auc_roc, and the
spatial-index primitive next to geo_grid_join.

Scale design (100 TB):
- ``brier_decomp``: forecasts are the quality_classifier integer
  scores squashed to exact milli-probabilities by the integer range
  map (1000·(score−lo)) div (hi−lo+1); ONE conditional aggregate
  pivots the corpus to a single row of exact-int64 per-bin stats
  (n_k, Σp, Σp², positives, Σp·label — K=10 bins as columns, the
  vopt_hist pivot discipline). Reliability, resolution, uncertainty
  and the within-bin variance term then evaluate as generated scalar
  expressions (identical text both engines, fixed order, CASE-guarded
  empty bins); the raw Brier score comes from the SAME integer stats
  (SSE = Σ_k Q_k − 2000·PL_k + 10⁶·O_k), so the test can pin Murphy's
  identity brier = rel − res + unc + wbv + wbc to picoscale\n  (wbc = the within-bin forecast/outcome covariance the textbook\n  decomposition drops by assuming constant forecasts per bin).
- ``closest_pair``: points (hashed 2-D coords in a 4096² universe)
  bucket into 64-unit grid cells; one side explodes its 3×3 neighbor
  offsets and the candidate set is ONE equi-join on the cell key —
  O(n·density), never the n² cross join, and each pair is produced by
  exactly one offset (no dedup needed). Exact integer d², global
  argmin via one min-struct aggregate. The python mirror brute-forces
  all pairs to certify the bucketed minimum IS the global minimum
  (cell size ≥ true min distance).

Reference parity: no stats/geometry layer in the reference; extends
calibration_bins (statsops.py:433), quality_classifier
(textops.py:1727), geo_grid_join (geoops.py:38), convex_hull.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textops import _QC_W, QC_BIAS, _qc_weight, QC_BUCKETS
from .util import DUCK_HEX32, DUCK_TOKENS, hex32, table, tokens

BD_BINS = 10
CP_UNIVERSE = 4096
CP_GRID = 64


def _brier_exprs() -> dict[str, str]:
    """Generated text over the one-row pivot (columns n_k, s_k, o_k,
    q_k, pl_k for k < BD_BINS, plus nn/ot) — identical both engines."""
    ex: dict[str, str] = {}
    ex["obar"] = "CAST(ot AS DOUBLE) / nn"
    rel = " + ".join(
        f"(CASE WHEN n_{k} > 0 THEN "
        f"(CAST(s_{k} AS DOUBLE)/1000/n_{k} - CAST(o_{k} AS DOUBLE)/n_{k})"
        f" * (CAST(s_{k} AS DOUBLE)/1000/n_{k} - CAST(o_{k} AS DOUBLE)/n_{k})"
        f" * n_{k} ELSE 0 END)"
        for k in range(BD_BINS)
    )
    ex["rel"] = f"({rel}) / nn"
    res = " + ".join(
        f"(CASE WHEN n_{k} > 0 THEN "
        f"(CAST(o_{k} AS DOUBLE)/n_{k} - obar)"
        f" * (CAST(o_{k} AS DOUBLE)/n_{k} - obar) * n_{k} ELSE 0 END)"
        for k in range(BD_BINS)
    )
    ex["res"] = f"({res}) / nn"
    ex["unc"] = "obar * (1 - obar)"
    # Σ(p_i − p̄)² in milli² = q − s²/n, then /1e6
    wbv = " + ".join(
        f"(CASE WHEN n_{k} > 0 THEN "
        f"(CAST(q_{k} AS DOUBLE) - CAST(s_{k} AS DOUBLE)"
        f" * CAST(s_{k} AS DOUBLE) / n_{k}) / 1000000 ELSE 0 END)"
        for k in range(BD_BINS)
    )
    ex["wbv"] = f"({wbv}) / nn"
    # within-bin p,o covariance: -2 Σ_k (PL_k - S_k O_k / n_k) / 1000 / N
    wbc = " + ".join(
        f"(CASE WHEN n_{k} > 0 THEN "
        f"(CAST(pl_{k} AS DOUBLE) - CAST(s_{k} AS DOUBLE)"
        f" * CAST(o_{k} AS DOUBLE) / n_{k}) / 1000 ELSE 0 END)"
        for k in range(BD_BINS)
    )
    ex["wbc"] = f"-2 * (({wbc}) / nn)"
    sse = " + ".join(
        f"(q_{k} - 2000 * pl_{k} + 1000000 * o_{k})" for k in range(BD_BINS)
    )
    ex["brier"] = f"CAST({sse} AS DOUBLE) / 1000000 / nn"
    ex["gap_pico"] = (
        "CAST(round((brier - (rel - res + unc + wbv + wbc)) * 1000000000000) "
        "AS BIGINT)"
    )
    return ex


def q_brier_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (module doc): n, brier, rel, res, unc, wbv (9dp) and
    the Murphy-identity gap in pico units."""
    d = table(spark, sf_dir, "documents", spread=True)
    toks = tokens(F.col("text"))
    score = F.aggregate(
        F.transform(toks, lambda t: _qc_weight(hex32(t) % QC_BUCKETS)),
        F.lit(QC_BIAS).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = d.select(
        score.alias("score"),
        (F.col("lang") == "en").cast("long").alias("label"),
    )
    mm = scored.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    p = scored.crossJoin(F.broadcast(mm)).select(
        F.expr("(1000 * (score - lo)) div (hi - lo + 1)").alias("p"),
        "label",
    ).withColumn("bin", F.expr(f"(p * {BD_BINS}) div 1000"))
    aggs = [
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("label").cast("long").alias("ot"),
    ]
    for k in range(BD_BINS):
        isk = (F.col("bin") == k).cast("long")
        aggs += [
            F.sum(isk).cast("long").alias(f"n_{k}"),
            F.sum(isk * F.col("p")).cast("long").alias(f"s_{k}"),
            F.sum(isk * F.col("label")).cast("long").alias(f"o_{k}"),
            F.sum(isk * F.col("p") * F.col("p")).cast("long").alias(f"q_{k}"),
            F.sum(isk * F.col("p") * F.col("label"))
            .cast("long")
            .alias(f"pl_{k}"),
        ]
    piv = p.agg(*aggs)
    for name, text in _brier_exprs().items():
        piv = piv.withColumn(name, F.expr(text))
    return piv.select(
        F.col("nn").alias("n"),
        F.round("brier", 9).alias("brier"),
        F.round("rel", 9).alias("rel"),
        F.round("res", 9).alias("res"),
        F.round("unc", 9).alias("unc"),
        F.round("wbv", 9).alias("wbv"),
        F.round("wbc", 9).alias("wbc"),
        "gap_pico",
    )


def q_closest_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed closest pair over hashed customer points (module
    doc): (min_d2, id_a, id_b, n_cand)."""
    c = table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").cast("long").alias("id"),
        (hex32(F.concat(F.lit("cpx|"), F.col("c_custkey").cast("string")))
         % CP_UNIVERSE).alias("x"),
        (hex32(F.concat(F.lit("cpy|"), F.col("c_custkey").cast("string")))
         % CP_UNIVERSE).alias("y"),
    )
    a = pts.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.floor(F.col("x") / CP_GRID).alias("cell_x"),
        F.floor(F.col("y") / CP_GRID).alias("cell_y"),
    )
    offs = F.expr("sequence(-1, 1)")
    b = (
        pts.select(
            F.col("id").alias("id_b"),
            F.col("x").alias("xb"),
            F.col("y").alias("yb"),
        )
        .withColumn("dx", F.explode(offs))
        .withColumn("dy", F.explode(offs))
        .select(
            "id_b",
            "xb",
            "yb",
            (F.floor(F.col("xb") / CP_GRID) + F.col("dx")).alias("cell_x"),
            (F.floor(F.col("yb") / CP_GRID) + F.col("dy")).alias("cell_y"),
        )
    )
    pairs = (
        a.join(b, ["cell_x", "cell_y"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
                + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
            ).alias("d2"),
        )
    )
    return pairs.agg(
        F.min(F.struct("d2", "id_a", "id_b")).alias("w"),
        F.count(F.lit(1)).cast("long").alias("n_cand"),
    ).select(
        F.col("w.d2").cast("long").alias("min_d2"),
        F.col("w.id_a").alias("id_a"),
        F.col("w.id_b").alias("id_b"),
        "n_cand",
    )


def _brier_sql() -> str:
    toks = DUCK_TOKENS.format(x="text")
    aggs = ["count(*)::BIGINT AS nn", "sum(label)::BIGINT AS ot"]
    for k in range(BD_BINS):
        isk = f"(CASE WHEN bin = {k} THEN 1 ELSE 0 END)"
        aggs += [
            f"sum({isk})::BIGINT AS n_{k}",
            f"sum({isk} * p)::BIGINT AS s_{k}",
            f"sum({isk} * label)::BIGINT AS o_{k}",
            f"sum({isk} * p * p)::BIGINT AS q_{k}",
            f"sum({isk} * p * label)::BIGINT AS pl_{k}",
        ]
    layers = [
        f"""scored AS (
    SELECT ({QC_BIAS} + coalesce(
               list_sum(list_transform({toks}, t -> {_QC_W})), 0
           ))::BIGINT AS score,
           (lang = 'en')::BIGINT AS label
    FROM documents)""",
        "mm AS (SELECT min(score) AS lo, max(score) AS hi FROM scored)",
        f"""p AS (
    SELECT (1000 * (score - lo)) // (hi - lo + 1) AS p, label,
           (((1000 * (score - lo)) // (hi - lo + 1)) * {BD_BINS}) // 1000
               AS bin
    FROM scored, mm)""",
        "piv AS (SELECT " + ", ".join(aggs) + " FROM p)",
    ]
    prev = "piv"
    for i, (name, text) in enumerate(_brier_exprs().items()):
        cur = f"l{i}"
        layers.append(f"{cur} AS (SELECT *, {text} AS {name} FROM {prev})")
        prev = cur
    return (
        "WITH " + ",\n".join(layers) + f"""
SELECT nn AS n, round(brier, 9) AS brier, round(rel, 9) AS rel,
       round(res, 9) AS res, round(unc, 9) AS unc, round(wbv, 9) AS wbv,
       round(wbc, 9) AS wbc, gap_pico
FROM {prev}
"""
    )


_CP_SQL = f"""
WITH pts AS (
    SELECT c_custkey::BIGINT AS id,
           ({DUCK_HEX32.format(x="'cpx|' || c_custkey::VARCHAR")})
               % {CP_UNIVERSE} AS x,
           ({DUCK_HEX32.format(x="'cpy|' || c_custkey::VARCHAR")})
               % {CP_UNIVERSE} AS y
    FROM customer
),
a AS (
    SELECT id AS id_a, x AS xa, y AS ya,
           x // {CP_GRID} AS cell_x, y // {CP_GRID} AS cell_y
    FROM pts
),
b AS (
    SELECT id AS id_b, x AS xb, y AS yb,
           x // {CP_GRID} + dx.d AS cell_x, y // {CP_GRID} + dy.d AS cell_y
    FROM pts,
         (SELECT unnest(generate_series(-1, 1)) AS d) dx,
         (SELECT unnest(generate_series(-1, 1)) AS d) dy
),
pairs AS (
    SELECT id_a, id_b,
           (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) AS d2
    FROM a JOIN b USING (cell_x, cell_y)
    WHERE id_a < id_b
)
SELECT (min(struct_pack(d2 := d2, id_a := id_a, id_b := id_b))).d2::BIGINT
           AS min_d2,
       (min(struct_pack(d2 := d2, id_a := id_a, id_b := id_b))).id_a AS id_a,
       (min(struct_pack(d2 := d2, id_a := id_a, id_b := id_b))).id_b AS id_b,
       count(*)::BIGINT AS n_cand
FROM pairs
"""

QUERIES = {
    "brier_decomp": q_brier_decomp,
    "closest_pair": q_closest_pair,
}

ORACLES = {
    "brier_decomp": _brier_sql(),
    "closest_pair": _CP_SQL,
}
