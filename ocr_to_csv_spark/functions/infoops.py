"""Information-theoretic comparison, batch 155: pairwise
Jensen–Shannon divergence between source unigram distributions and the
mutual information between the customer table's categorical axes — the
bounded symmetric distribution distance (JSD ≤ ln 2) next to
burrows_delta/psi_drift, and the dependence measure χ² only
approximates next to chi2_cells/cramers_v.

Scale design (100 TB):
- ``jsd_matrix``: vocabularies are capped to the corpus top-V=64
  words plus an OOV bucket (exact remainder mass — no probability is
  dropped), so each source is a 65-dim exact-integer count vector;
  the zero-filled (word, source) grid is TWO keyed aggregates, and
  the pairwise JSD — ½Σp·ln(2p/(p+q)) + ½Σq·ln(2q/(p+q)) with
  0·ln0 = 0 — is a bounded fixed-order in-row fold over the packed
  grid (the burrows_delta device), 9dp.
- ``mutual_info``: the 5×5 segment × region contingency pivots to one
  exact-int row (the ipf_raking pivot); each MI term
  k·ln(k·n/(r·c)) and each entropy term r·ln(n/r) is leaf-rounded to
  INTEGER nano, so n·MI and n·H are pure int64 and the normalized
  MI (2·MI/(H_row+H_col)) is one integer division to milli.

Reference parity: no information-theory layer in the reference;
extends cooc_pmi, psi_drift, char_entropy, theil_decomp, chi2_cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .rakingops import REGIONS, SEGMENTS
from .util import DUCK_TOKENS, table, tokens

JSD_V = 64
NANO = 1_000_000_000


def q_jsd_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise JSD between source unigram distributions (module doc):
    (src_a, src_b, jsd)."""
    d = table(spark, sf_dir, "documents", spread=True)
    ws = d.select(
        F.col("source").alias("src"),
        F.explode(tokens(F.lower(F.col("text")))).alias("w"),
    )
    top = (
        ws.groupBy("w")
        .agg(F.count(F.lit(1)).alias("tot"))
        .orderBy(F.col("tot").desc(), "w")
        .limit(JSD_V)
        .select("w")
    )
    per_src = ws.groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    counts = (
        ws.join(F.broadcast(top), "w")
        .groupBy("w", "src")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    grid = (
        top.crossJoin(per_src)
        .join(counts, ["w", "src"], "left")
        .select(
            "w", "src",
            F.coalesce("c", F.lit(0)).cast("long").alias("c"),
            F.col("n").cast("long").alias("n"),
        )
    )
    # OOV bucket: per source, n − Σ top counts (appended with w = '\x7f')
    oov = grid.groupBy("src").agg(
        (F.max("n") - F.sum("c")).cast("long").alias("c"),
        F.max("n").cast("long").alias("n"),
    ).select(F.lit("\x7f~oov").alias("w"), "src", "c", "n")
    grid = grid.unionByName(oov)
    packed = grid.agg(
        F.array_sort(
            F.collect_list(F.struct("w", "src", "c", "n"))
        ).alias("g"),
        F.array_sort(F.collect_set("src")).alias("srcs"),
        (F.size(F.collect_set("w"))).alias("wn"),
    )
    s = F.size("srcs")
    wn = F.col("wn")
    fs = F.transform(
        F.col("g"), lambda x: x["c"].cast("double") / x["n"].cast("double")
    )
    packed = packed.withColumn("fs", fs)
    fs2 = F.col("fs")

    def pat(wi, j):
        return F.element_at(fs2, wi * s + j + 1)

    def klterm(p, q):
        # p·ln(2p/(p+q)), 0 when p = 0
        return F.when(
            p > 0, p * F.ln((2 * p) / (p + q))
        ).otherwise(F.lit(0.0))

    pair_idx = F.filter(
        F.sequence(F.lit(0), s * s - 1),
        lambda pp: (pp % s) > F.floor(pp / s),
    )
    pairs = F.transform(
        pair_idx,
        lambda pp: F.struct(
            F.element_at(
                F.col("srcs"), F.floor(pp / s).cast("int") + 1
            ).alias("src_a"),
            F.element_at(F.col("srcs"), (pp % s).cast("int") + 1).alias(
                "src_b"
            ),
            F.round(
                F.aggregate(
                    F.sequence(F.lit(0), wn - 1),
                    F.lit(0.0),
                    lambda acc, wi: acc
                    + F.lit(0.5)
                    * klterm(
                        pat(wi, F.floor(pp / s).cast("int")),
                        pat(wi, (pp % s).cast("int")),
                    )
                    + F.lit(0.5)
                    * klterm(
                        pat(wi, (pp % s).cast("int")),
                        pat(wi, F.floor(pp / s).cast("int")),
                    ),
                ),
                9,
            ).alias("jsd"),
        ),
    )
    return (
        packed.select(F.explode(pairs).alias("p"))
        .select("p.src_a", "p.src_b", "p.jsd")
        .orderBy("src_a", "src_b")
    )


def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MI between segment and region (module doc): one row
    (n, mi_num_nano, h_seg_nano, h_reg_nano, nmi_milli)."""
    c = table(spark, sf_dir, "customer")
    n_t = table(spark, sf_dir, "nation")
    r_t = table(spark, sf_dir, "region")
    cells = (
        c.join(n_t, c["c_nationkey"] == n_t["n_nationkey"])
        .join(r_t, n_t["n_regionkey"] == r_t["r_regionkey"])
        .select(
            F.col("c_mktsegment").alias("seg"), F.col("r_name").alias("reg")
        )
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i, sname in enumerate(SEGMENTS):
        for j, g in enumerate(REGIONS):
            aggs.append(
                F.sum(
                    ((F.col("seg") == sname) & (F.col("reg") == g)).cast(
                        "long"
                    )
                )
                .cast("long")
                .alias(f"k_{i}_{j}")
            )
    piv = cells.agg(*aggs)
    for i in range(len(SEGMENTS)):
        piv = piv.withColumn(
            f"r_{i}",
            sum(F.col(f"k_{i}_{j}") for j in range(len(REGIONS))),
        )
    for j in range(len(REGIONS)):
        piv = piv.withColumn(
            f"c_{j}",
            sum(F.col(f"k_{i}_{j}") for i in range(len(SEGMENTS))),
        )
    mi_terms = []
    for i in range(len(SEGMENTS)):
        for j in range(len(REGIONS)):
            mi_terms.append(
                f"(CASE WHEN k_{i}_{j} > 0 THEN CAST(round("
                f"CAST(k_{i}_{j} AS DOUBLE) * ln((CAST(k_{i}_{j} AS DOUBLE)"
                f" * n) / (CAST(r_{i} AS DOUBLE) * c_{j})) * {NANO}) "
                f"AS BIGINT) ELSE 0 END)"
            )
    h_seg = " + ".join(
        f"(CASE WHEN r_{i} > 0 THEN CAST(round(CAST(r_{i} AS DOUBLE) * "
        f"ln(CAST(n AS DOUBLE) / r_{i}) * {NANO}) AS BIGINT) ELSE 0 END)"
        for i in range(len(SEGMENTS))
    )
    h_reg = " + ".join(
        f"(CASE WHEN c_{j} > 0 THEN CAST(round(CAST(c_{j} AS DOUBLE) * "
        f"ln(CAST(n AS DOUBLE) / c_{j}) * {NANO}) AS BIGINT) ELSE 0 END)"
        for j in range(len(REGIONS))
    )
    piv = (
        piv.withColumn("mi_num_nano", F.expr(" + ".join(mi_terms)))
        .withColumn("h_seg_nano", F.expr(h_seg))
        .withColumn("h_reg_nano", F.expr(h_reg))
    )
    return piv.select(
        "n",
        "mi_num_nano",
        "h_seg_nano",
        "h_reg_nano",
        F.expr(
            "(2000 * greatest(mi_num_nano, 0L)) div "
            "(h_seg_nano + h_reg_nano)"
        ).alias("nmi_milli"),
    )


_TOKS = DUCK_TOKENS.format(x="lower(text)")


def _jsd_sql() -> str:
    pat_a = "fs[wi * s + (pp // s) + 1]"
    pat_b = "fs[wi * s + (pp % s) + 1]"

    def kl(p, q):
        return (
            f"(CASE WHEN {p} > 0 THEN {p} * ln((2 * {p}) / ({p} + {q})) "
            f"ELSE 0.0 END)"
        )

    fold = (
        "round(list_reduce(list_prepend([0.0::DOUBLE], "
        "list_transform(generate_series(0, wn - 1), wi -> "
        f"[0.5 * {kl(pat_a, pat_b)} + 0.5 * {kl(pat_b, pat_a)}])), "
        "(acc, wv) -> [acc[1] + wv[1]])[1], 9)"
    )
    return f"""
WITH ws AS (
    SELECT source AS src, unnest({_TOKS}) AS w FROM documents
),
top AS (
    SELECT w FROM (
        SELECT w, count(*) AS tot FROM ws GROUP BY w
        ORDER BY tot DESC, w LIMIT {JSD_V})
),
per_src AS (SELECT src, count(*)::BIGINT AS n FROM ws GROUP BY src),
counts AS (
    SELECT w, src, count(*)::BIGINT AS c
    FROM ws JOIN top USING (w) GROUP BY w, src
),
grid0 AS (
    SELECT t.w, p.src, coalesce(c.c, 0)::BIGINT AS c, p.n
    FROM top t CROSS JOIN per_src p
    LEFT JOIN counts c ON c.w = t.w AND c.src = p.src
),
oov AS (
    SELECT chr(127) || '~oov' AS w, src,
           (max(n) - sum(c))::BIGINT AS c, max(n)::BIGINT AS n
    FROM grid0 GROUP BY src
),
grid AS (SELECT * FROM grid0 UNION ALL SELECT * FROM oov),
packed AS (
    SELECT list(struct_pack(w := w, src := src, c := c, n := n)
                ORDER BY w, src) AS gl,
           list_sort(list(DISTINCT src)) AS srcs,
           count(DISTINCT w)::BIGINT AS wn
    FROM grid
),
l0 AS (
    SELECT srcs, len(srcs) AS s, wn,
           list_transform(gl, x -> CAST(x.c AS DOUBLE) / x.n) AS fs
    FROM packed
),
l1 AS (
    SELECT srcs, s, wn, fs,
           unnest(list_filter(generate_series(0, s * s - 1),
                              pp -> (pp % s) > (pp // s))) AS pp
    FROM l0
)
SELECT srcs[(pp // s) + 1] AS src_a,
       srcs[(pp % s) + 1] AS src_b,
       {fold} AS jsd
FROM l1
ORDER BY src_a, src_b
"""


def _mi_sql() -> str:
    aggs = ["count(*)::BIGINT AS n"]
    for i, sname in enumerate(SEGMENTS):
        for j, g in enumerate(REGIONS):
            aggs.append(
                f"sum(CASE WHEN seg = '{sname}' AND reg = '{g}' THEN 1 "
                f"ELSE 0 END)::BIGINT AS k_{i}_{j}"
            )
    rows = ", ".join(
        f"({' + '.join(f'k_{i}_{j}' for j in range(len(REGIONS)))}) AS r_{i}"
        for i in range(len(SEGMENTS))
    )
    cols = ", ".join(
        f"({' + '.join(f'k_{i}_{j}' for i in range(len(SEGMENTS)))}) AS c_{j}"
        for j in range(len(REGIONS))
    )
    mi_terms = " + ".join(
        f"(CASE WHEN k_{i}_{j} > 0 THEN CAST(round("
        f"CAST(k_{i}_{j} AS DOUBLE) * ln((CAST(k_{i}_{j} AS DOUBLE) * n) / "
        f"(CAST(r_{i} AS DOUBLE) * c_{j})) * {NANO}) AS BIGINT) "
        f"ELSE 0 END)"
        for i in range(len(SEGMENTS))
        for j in range(len(REGIONS))
    )
    h_seg = " + ".join(
        f"(CASE WHEN r_{i} > 0 THEN CAST(round(CAST(r_{i} AS DOUBLE) * "
        f"ln(CAST(n AS DOUBLE) / r_{i}) * {NANO}) AS BIGINT) ELSE 0 END)"
        for i in range(len(SEGMENTS))
    )
    h_reg = " + ".join(
        f"(CASE WHEN c_{j} > 0 THEN CAST(round(CAST(c_{j} AS DOUBLE) * "
        f"ln(CAST(n AS DOUBLE) / c_{j}) * {NANO}) AS BIGINT) ELSE 0 END)"
        for j in range(len(REGIONS))
    )
    return f"""
WITH cells AS (
    SELECT c_mktsegment AS seg, r_name AS reg
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
),
piv AS (SELECT {', '.join(aggs)} FROM cells),
marg AS (SELECT *, {rows}, {cols} FROM piv),
vals AS (
    SELECT n, ({mi_terms})::BIGINT AS mi_num_nano,
           ({h_seg})::BIGINT AS h_seg_nano,
           ({h_reg})::BIGINT AS h_reg_nano
    FROM marg
)
SELECT n, mi_num_nano, h_seg_nano, h_reg_nano,
       ((2000 * greatest(mi_num_nano, 0)) // (h_seg_nano + h_reg_nano))
           ::BIGINT AS nmi_milli
FROM vals
"""


QUERIES = {
    "jsd_matrix": q_jsd_matrix,
    "mutual_info": q_mutual_info,
}

ORACLES = {
    "jsd_matrix": _jsd_sql(),
    "mutual_info": _mi_sql(),
}
