"""Spectral readout, batch 118b: top eigenvector of the embedding
covariance (leading D=8 dimensions) by power iteration — the dominant
principal direction pca_cov only exposes as raw covariance cells, run
entirely as generated expressions over a ONE-ROW pivot.

Scale design (100 TB):
- Data-scale work = ONE map-side aggregate over the embedding scan
  producing n, the 8 dimension sums and the 36 upper-triangle cross
  sums of the INTEGER-scaled coordinates (round(e·1000) — the
  pca_cov/sq_encode discipline, so the partial aggregation is exact
  int64 and order-independent across any shuffle). Covariance
  numerators n·Σxy − Σx·Σy are exact int64 on that single row.
- The K=4 power-iteration steps are the markov_removal device: 8
  matvec expressions + one max-abs normalization per step, generated
  ONCE as text and fed verbatim to both engines (pure double
  arithmetic with a FIXED evaluation order inside one row — no
  aggregation of floats anywhere, so bit parity holds), then
  leaf-rounded 9dp on output. Rayleigh quotient numerator/denominator
  are computed from the same normalized vector and rounded once.
- Output = 9 rows (component, value) + (-1, rayleigh): constant-size
  whatever n is.

Reference parity: no linear-algebra layer in the reference; extends
the embedding-analytics family (pca_cov, rp_embed, kmeans,
semdedup) with the spectral summary those methods precondition on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

EIG_D = 8  # leading dims
EIG_K = 4  # power-iteration steps
EIG_SCALE = 1000  # integer embedding scale (pca_cov discipline)


def _iter_exprs() -> dict[str, str]:
    """Ordered name → expression text over the one-row pivot. Stats
    columns: n, s_i, s_i_j (i ≤ j). cov_i_j defined for all i, j via
    symmetry; x components x{k}_{i}."""
    ex: dict[str, str] = {}
    for i in range(EIG_D):
        for j in range(EIG_D):
            a, b = min(i, j), max(i, j)
            ex[f"cov_{i}_{j}"] = f"CAST(n * s_{a}_{b} - s_{a} * s_{b} AS DOUBLE)"
    for i in range(EIG_D):
        ex[f"x0_{i}"] = "CAST(1.0 AS DOUBLE)"
    for k in range(1, EIG_K + 1):
        for i in range(EIG_D):
            dot = " + ".join(
                f"cov_{i}_{j} * x{k - 1}_{j}" for j in range(EIG_D)
            )
            ex[f"y{k}_{i}"] = dot
        norm = ", ".join(f"abs(y{k}_{i})" for i in range(EIG_D))
        ex[f"m{k}"] = f"greatest({norm})"
        for i in range(EIG_D):
            ex[f"x{k}_{i}"] = f"y{k}_{i} / m{k}"
    K = EIG_K
    num = " + ".join(
        f"x{K}_{i} * cov_{i}_{j} * x{K}_{j}"
        for i in range(EIG_D)
        for j in range(EIG_D)
    )
    den = " + ".join(f"x{K}_{i} * x{K}_{i}" for i in range(EIG_D))
    ex["rayleigh"] = f"round(({num}) / ({den}), 3)"
    for i in range(EIG_D):
        ex[f"v_{i}"] = f"round(x{K}_{i}, 9)"
    return ex


def q_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-eigenvector components (max-abs-normalized) and Rayleigh
    quotient of the 8-dim integer covariance (module doc)."""
    emb = table(spark, sf_dir, "embeddings", spread=True)
    v = lambda i: F.round(  # noqa: E731
        F.element_at("embedding", i + 1) * EIG_SCALE
    ).cast("long")
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i in range(EIG_D):
        aggs.append(F.sum(v(i)).alias(f"s_{i}"))
    for i in range(EIG_D):
        for j in range(i, EIG_D):
            aggs.append(F.sum(v(i) * v(j)).alias(f"s_{i}_{j}"))
    piv = emb.agg(*aggs)
    for name, text in _iter_exprs().items():
        piv = piv.withColumn(name, F.expr(text))
    rows = ", ".join(
        f"CAST({i} AS BIGINT), v_{i}" for i in range(EIG_D)
    )
    return piv.select(
        F.expr(
            f"stack({EIG_D + 1}, {rows}, CAST(-1 AS BIGINT), rayleigh) "
            "AS (component, value)"
        )
    ).orderBy("component")


def _eig_sql() -> str:
    vi = "CAST(round(embedding[{i} + 1]::DOUBLE * {s}) AS BIGINT)"
    cols = ["count(*)::BIGINT AS n"]
    for i in range(EIG_D):
        cols.append(
            f"sum({vi.format(i=i, s=EIG_SCALE)})::BIGINT AS s_{i}"
        )
    for i in range(EIG_D):
        for j in range(i, EIG_D):
            cols.append(
                f"sum({vi.format(i=i, s=EIG_SCALE)} * "
                f"{vi.format(i=j, s=EIG_SCALE)})::BIGINT AS s_{i}_{j}"
            )
    layers = [
        "stats AS (SELECT " + ", ".join(cols) + " FROM embeddings)"
    ]
    prev = "stats"
    for k, (name, text) in enumerate(_iter_exprs().items()):
        cur = f"l{k}"
        layers.append(f"{cur} AS (SELECT *, {text} AS {name} FROM {prev})")
        prev = cur
    selects = " UNION ALL ".join(
        f"SELECT {i}::BIGINT AS component, v_{i} AS value FROM {prev}"
        for i in range(EIG_D)
    )
    selects += f" UNION ALL SELECT -1::BIGINT, rayleigh FROM {prev}"
    return "WITH " + ",\n".join(layers) + "\n" + selects + "\nORDER BY component"


QUERIES = {"power_iteration": q_power_iteration}

ORACLES = {"power_iteration": _eig_sql()}
