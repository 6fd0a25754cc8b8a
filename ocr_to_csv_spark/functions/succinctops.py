"""Succinct structures, batch 159: a rank/select bit-directory over
the urgent-order bitvector and FM-index backward-search counting over
document BWTs — the two classic compressed-indexing primitives
(Jacobson rank; Ferragina–Manzini count) next to postings/bwt_rle.

Scale design (100 TB):
- ``rank_select``: the bitvector (orders in orderkey order, bit =
  '1-URGENT') packs into 32-bit block masks by ONE keyed bit_or (the
  bloom_fpr_audit discipline — 32-bit so 1<<r never hits the signed
  edge), with block popcounts cumulated by a window over the BLOCK
  table (n/32-bounded, not row-level). Rank probes answer as
  cum_before + popcount(mask & ((1<<r)−1)); select probes find the
  first block whose cumulative count reaches k, then scan its 32 bits
  in-row. Every answer is re-verified in-query against the direct
  row-level count — the correctness flags ship in the output and are
  pinned all-1.
- ``fm_count``: per probe doc, the BWT of text[:64]+sentinel (the
  bwt_rle rotation sort) supports backward search: for pattern chars
  right-to-left, [lo, hi) maps through C[c] + rank_bwt(c, ·) — rank
  computed as a bounded in-row prefix count. The FM count equals the
  direct substring-occurrence count ((len − len(replace))/|pat|),
  pinned per doc — counting WITHOUT scanning the text, from the
  transform alone.

Reference parity: no indexing layer in the reference; extends
postings, prefix_autocomplete, bwt_rle/mtf_encode, bloom_fpr_audit.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .bwtops import BWT_LEN, PROBE_MOD
from .util import DUCK_HEX32, hex32, table

BLK = 32
N_PROBES = 8
FM_PAT = "tab"
SENT = "\x01"


def _masks() -> Column:
    return F.array(
        *[F.lit((1 << j) - 1).cast("long") for j in range(1, BLK + 1)]
    )


def q_rank_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank/select probes over the urgent-order bitvector (module
    doc): (kind, probe, answer, direct, ok)."""
    o = table(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    bits = o.select(
        F.col("o_orderkey"),
        (F.col("o_orderpriority") == "1-URGENT").cast("long").alias("b"),
    ).withColumn("pos", F.row_number().over(w).cast("long"))
    n = bits.count()
    blocks = bits.groupBy(
        F.floor((F.col("pos") - 1) / BLK).cast("long").alias("blk")
    ).agg(
        F.expr(f"bit_or(CASE WHEN b = 1 THEN shiftleft(1L, "
               f"int((pos - 1) % {BLK})) ELSE 0L END)").alias("mask"),
        F.sum("b").cast("long").alias("cnt"),
    )
    wb = Window.orderBy("blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    blocks = blocks.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(wb), F.lit(0))
    ).withColumn("cum", F.col("cum_before") + F.col("cnt"))
    total_ones = bits.agg(F.sum("b")).collect()[0][0]
    probes = []
    for k in range(N_PROBES):
        probes.append(("rank", None, f"rs|{k}"))
        probes.append(("select", None, f"ss|{k}"))
    pr = spark.createDataFrame(
        [(kind, tag) for kind, _, tag in probes], "kind string, tag string"
    ).select(
        "kind",
        F.when(
            F.col("kind") == "rank",
            hex32(F.col("tag")) % F.lit(n) + 1,
        )
        .otherwise(hex32(F.col("tag")) % F.lit(int(total_ones)) + 1)
        .alias("probe"),
    )
    # rank: block lookup + within-block popcount
    rk = (
        pr.filter(F.col("kind") == "rank")
        .join(
            blocks,
            F.floor((F.col("probe") - 1) / BLK).cast("long") == F.col("blk"),
        )
        .select(
            "kind",
            "probe",
            (
                F.col("cum_before")
                + F.expr(
                    f"bit_count(mask & (shiftleft(1L, "
                    f"int((probe - 1) % {BLK} + 1)) - 1))"
                )
            ).cast("long").alias("answer"),
        )
    )
    # select: first block with cum >= k, then in-row bit scan
    sel = (
        pr.filter(F.col("kind") == "select")
        .join(blocks, F.col("cum") >= F.col("probe"))
        .groupBy("kind", "probe")
        .agg(F.min(F.struct("blk", "cum_before", "mask")).alias("w"))
        .select(
            "kind",
            "probe",
            (
                F.col("w.blk") * BLK
                + F.array_min(
                    F.filter(
                        F.sequence(F.lit(1), F.lit(BLK)),
                        lambda j: (
                            F.col("w.cum_before")
                            + F.bit_count(
                                F.col("w.mask").bitwiseAND(
                                    F.element_at(_masks(), j.cast("int"))
                                )
                            )
                        )
                        >= F.col("probe"),
                    )
                ).cast("long")
            ).alias("answer"),
        )
    )
    # direct verification
    direct_rank = (
        rk.alias("p")
        .join(bits.alias("v"), F.col("v.pos") <= F.col("p.probe"))
        .groupBy("kind", "probe", "answer")
        .agg(F.sum("v.b").cast("long").alias("direct"))
    )
    ones = bits.filter(F.col("b") == 1).withColumn(
        "onerank", F.row_number().over(Window.orderBy("pos")).cast("long")
    )
    direct_sel = sel.join(
        ones, F.col("onerank") == F.col("probe")
    ).select("kind", "probe", "answer", F.col("pos").alias("direct"))
    out = direct_rank.unionByName(direct_sel)
    return out.select(
        "kind",
        "probe",
        "answer",
        "direct",
        (F.col("answer") == F.col("direct")).cast("long").alias("ok"),
    ).orderBy("kind", "probe")


def _bwt_sent(s: Column) -> Column:
    t = F.concat(s, F.lit(SENT))
    nn = F.length(t)
    rots = F.transform(
        F.sequence(F.lit(1), nn),
        lambda i: F.concat(
            t.substr(i, nn - i + 1), t.substr(F.lit(1), i - 1)
        ),
    )
    return F.array_join(
        F.transform(F.array_sort(rots), lambda r: r.substr(nn, F.lit(1))),
        "",
    )


def q_fm_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FM backward-search count of FM_PAT per probe doc (module doc):
    (doc_id, n, fm_count, direct_count, ok)."""
    d = table(spark, sf_dir, "documents")
    p = d.filter(F.col("doc_id") % PROBE_MOD == 0).select(
        "doc_id", F.substring(F.col("text"), 1, BWT_LEN).alias("s")
    )
    s = F.col("s")
    bwt = _bwt_sent(s)
    p = p.withColumn("bwt", bwt)
    b = F.col("bwt")
    nn = F.length(b)
    chars = F.transform(
        F.sequence(F.lit(1), nn), lambda i: b.substr(i, F.lit(1))
    )
    p = p.withColumn("bc", chars)
    bc = F.col("bc")

    def smaller(c):  # C[c]: #chars < c in bwt
        return F.size(F.filter(bc, lambda x: x < c)).cast("long")

    def rank(c, i):  # occurrences of c in bwt[1..i]
        return F.size(
            F.filter(
                F.slice(bc, 1, i.cast("int")), lambda x: x == c
            )
        ).cast("long")

    lo = F.lit(0).cast("long")
    hi = nn.cast("long")
    for ch in reversed(FM_PAT):
        c = F.lit(ch)
        lo, hi = (
            smaller(c) + rank(c, lo),
            smaller(c) + rank(c, hi),
        )
    fm = F.greatest(hi - lo, F.lit(0).cast("long"))
    direct = (
        (
            F.length(s)
            - F.length(F.replace(s, F.lit(FM_PAT), F.lit("")))
        )
        / len(FM_PAT)
    ).cast("long")
    return p.select(
        "doc_id",
        F.length(s).cast("long").alias("n"),
        fm.alias("fm_count"),
        direct.alias("direct_count"),
        (fm == direct).cast("long").alias("ok"),
    ).orderBy("doc_id")


def _rs_sql(n: int, total_ones: int) -> str:
    return f"""
WITH bits AS (
    SELECT row_number() OVER (ORDER BY o_orderkey) AS pos,
           (CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               ::BIGINT AS b
    FROM orders
),
blocks AS (
    SELECT (pos - 1) // {BLK} AS blk,
           bit_or(CASE WHEN b = 1 THEN (1::BIGINT << ((pos - 1) % {BLK})
                  ::INT) ELSE 0 END) AS mask,
           sum(b)::BIGINT AS cnt
    FROM bits GROUP BY 1
),
cums AS (
    SELECT *, coalesce(sum(cnt) OVER (ORDER BY blk
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
        coalesce(sum(cnt) OVER (ORDER BY blk
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS cum
    FROM blocks
),
probes AS (
    SELECT 'rank' AS kind,
           ({DUCK_HEX32.format(x="'rs|' || k::VARCHAR")}) % {n} + 1
               AS probe
    FROM (SELECT unnest(generate_series(0, {N_PROBES - 1})) AS k)
    UNION ALL
    SELECT 'select',
           ({DUCK_HEX32.format(x="'ss|' || k::VARCHAR")}) % {total_ones} + 1
    FROM (SELECT unnest(generate_series(0, {N_PROBES - 1})) AS k)
),
rk AS (
    SELECT p.kind, p.probe,
           (c.cum_before + bit_count(c.mask &
               ((1::BIGINT << (((p.probe - 1) % {BLK})::INT + 1)) - 1)))
               ::BIGINT AS answer
    FROM probes p JOIN cums c ON (p.probe - 1) // {BLK} = c.blk
    WHERE p.kind = 'rank'
),
selw AS (
    SELECT p.kind, p.probe,
           min(struct_pack(blk := c.blk, cb := c.cum_before,
                           mask := c.mask)) AS w
    FROM probes p JOIN cums c ON c.cum >= p.probe
    WHERE p.kind = 'select'
    GROUP BY p.kind, p.probe
),
sel AS (
    SELECT kind, probe,
           ((w).blk * {BLK} + list_min(list_filter(
               generate_series(1, {BLK}),
               j -> (w).cb + bit_count((w).mask &
                    ((1::BIGINT << j::INT) - 1)) >= probe)))::BIGINT
               AS answer
    FROM selw
),
dr AS (
    SELECT r.kind, r.probe, r.answer,
           (SELECT sum(b) FROM bits WHERE pos <= r.probe)::BIGINT AS direct
    FROM rk r
),
ones AS (
    SELECT pos, row_number() OVER (ORDER BY pos) AS onerank
    FROM bits WHERE b = 1
),
ds AS (
    SELECT s.kind, s.probe, s.answer, o.pos::BIGINT AS direct
    FROM sel s JOIN ones o ON o.onerank = s.probe
)
SELECT kind, probe::BIGINT AS probe, answer, direct,
       (answer = direct)::BIGINT AS ok
FROM (SELECT * FROM dr UNION ALL SELECT * FROM ds)
ORDER BY kind, probe
"""


def _fm_sql() -> str:
    t = "(s || chr(1))"
    bwt = (
        f"array_to_string(list_transform(list_sort("
        f"list_transform(generate_series(1, length({t})), "
        f"i -> substr({t}, i, length({t}) - i + 1) || "
        f"substr({t}, 1, i - 1))), "
        f"r -> substr(r, length({t}), 1)), '')"
    )
    steps = []
    lo, hi = "0::BIGINT", "length(bwt)::BIGINT"
    for ch in reversed(FM_PAT):
        c = f"'{ch}'"
        sm = (
            f"len(list_filter(bc, x -> x < {c}))::BIGINT"
        )
        lo_new = (
            f"({sm} + len(list_filter(list_slice(bc, 1, ({lo})::INT), "
            f"x -> x = {c})))::BIGINT"
        )
        hi_new = (
            f"({sm} + len(list_filter(list_slice(bc, 1, ({hi})::INT), "
            f"x -> x = {c})))::BIGINT"
        )
        lo, hi = lo_new, hi_new
    return f"""
WITH p AS (
    SELECT doc_id, substr(text, 1, {BWT_LEN}) AS s
    FROM documents WHERE doc_id % {PROBE_MOD} = 0
),
bt AS (SELECT doc_id, s, {bwt} AS bwt FROM p),
bcs AS (
    SELECT doc_id, s, bwt,
           list_transform(generate_series(1, length(bwt)),
                          i -> substr(bwt, i, 1)) AS bc
    FROM bt
)
SELECT doc_id, length(s)::BIGINT AS n,
       greatest(({hi}) - ({lo}), 0)::BIGINT AS fm_count,
       ((length(s) - length(replace(s, '{FM_PAT}', '')))
           // {len(FM_PAT)})::BIGINT AS direct_count,
       (greatest(({hi}) - ({lo}), 0) =
        (length(s) - length(replace(s, '{FM_PAT}', '')))
           // {len(FM_PAT)})::BIGINT AS ok
FROM bcs
ORDER BY doc_id
"""


def _rs_oracle() -> str:
    # n / total_ones are data constants; read them at oracle build from
    # the gate's sf dir (SPARK_GRAFT_ORACLE_SF_DIR — the staged-gold
    # convention; default sf0.01, the driver's scale)
    import duckdb

    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    con = duckdb.connect()
    n, ones = con.sql(
        "SELECT count(*), sum(CASE WHEN o_orderpriority = '1-URGENT' "
        "THEN 1 ELSE 0 END) FROM "
        f"'{sf_dir}/orders.parquet'"
    ).fetchall()[0]
    con.close()
    return _rs_sql(int(n), int(ones))


QUERIES = {
    "rank_select": q_rank_select,
    "fm_count": q_fm_count,
}

ORACLES = {
    "rank_select": _rs_oracle(),
    "fm_count": _fm_sql(),
}
