"""Web-graph curation operators, batch 113: exact-integer modularity of
a community assignment over the shared link graph, and inbound
anchor-text aggregation per destination host — the classic web-corpus
relevance signal (anchor text describes the TARGET better than the
target's own words) and the partition-quality number every community
detection run (label_prop, ring_assign) should be scored by.

Scale design (100 TB):
- ``modularity_score``: the synthesized doc→doc link graph (same
  generator as pagerank/hits — graphtext._edges) is symmetrized and
  dropped to distinct non-loop arcs (ONE shuffle at edge scale); the
  community label is a map-side expression (id % K). After that,
  everything is community-keyed: intra-arc counts and degree mass are
  two keyed aggs whose output is K rows, and the modularity numerator
  Q_c·(2m)² = 2m·intra_sym_c − D_c² is EXACT int64 per community (no
  float division ever crosses an engine; 2m ≤ 3n so the square stays
  far inside int64 at any sandbox SF, and the formula documents the
  decimal(38) rewrite for 10^12-edge graphs). The single driver-visible
  scalar is the node count the edge generator is parameterized by (the
  hits/pagerank precedent).
- ``anchor_text``: links + their anchor terms are synthesized map-side
  from each document (first/second token as anchor — no extra table),
  exploded, then aggregated at (dst_host, term) — the only edge-scale
  shuffle, with hot-host skew absorbed by AQE exactly like the
  link_graph rollup. The per-host top-3 window and the host-total join
  run on the (hosts × terms) aggregate, which is vocabulary-bounded
  metadata; the totals side is host-cardinality and broadcasts.

Reference parity: no graph layer in the reference; extends the
link_graph/pagerank/label_prop family (textops.py:630, graphtext.py:139)
with the scoring + anchor-signal halves a crawl-corpus pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .graphtext import _edges
from .util import DUCK_TOKENS, table, tokens

K_COMM = 8  # community label = id % K_COMM
TOP_TERMS = 3  # anchor terms kept per destination host


def q_modularity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community exact modularity numerators over the shared link
    graph with communities c(i) = i % K (module doc): emits
    (community, intra_sym, degree_sum, q_num, two_m) where
    q_num = 2m·intra_sym − degree_sum² and Q = Σ q_num / (2m)²."""
    d = table(spark, sf_dir, "documents")
    n = d.count()
    nodes = d.select(F.col("doc_id").cast("long").alias("id"))
    e = _edges(nodes, n).filter(F.col("src") != F.col("dst"))
    sym = (
        e.select("src", "dst")
        .unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    arcs = sym.select(
        (F.col("src") % K_COMM).alias("c_src"),
        (F.col("dst") % K_COMM).alias("c_dst"),
        "src",
    )
    deg = arcs.groupBy(F.col("src").alias("id"), F.col("c_src").alias("community")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    dmass = deg.groupBy("community").agg(F.sum("deg").alias("degree_sum"))
    intra = (
        arcs.filter(F.col("c_src") == F.col("c_dst"))
        .groupBy(F.col("c_src").alias("community"))
        .agg(F.count(F.lit(1)).alias("intra_sym"))
    )
    two_m = sym.count()
    return (
        dmass.join(intra, "community", "left")
        .select(
            F.col("community").cast("long").alias("community"),
            F.coalesce("intra_sym", F.lit(0)).cast("long").alias("intra_sym"),
            F.col("degree_sum").cast("long").alias("degree_sum"),
            (
                F.lit(two_m) * F.coalesce("intra_sym", F.lit(0))
                - F.col("degree_sum") * F.col("degree_sum")
            ).cast("long").alias("q_num"),
            F.lit(two_m).cast("long").alias("two_m"),
        )
        .orderBy("community")
    )


_MOD_SQL = f"""
WITH nodes AS (SELECT doc_id::BIGINT AS id FROM documents),
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
e AS (
    SELECT id AS src, (id*2+1) % (SELECT n FROM nn) AS dst
    FROM nodes WHERE id % 3 <> 0
    UNION ALL
    SELECT id, (id*7+3) % (SELECT n FROM nn) FROM nodes WHERE id % 2 = 0
    UNION ALL
    SELECT id, (id + (SELECT n FROM nn) // 2) % (SELECT n FROM nn)
    FROM nodes WHERE id % 6 = 1
),
sym AS (
    SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM e WHERE src <> dst
        UNION ALL
        SELECT dst, src FROM e WHERE src <> dst
    )
),
tm AS (SELECT count(*)::BIGINT AS two_m FROM sym),
deg AS (
    SELECT src AS id, src % {K_COMM} AS community, count(*)::BIGINT AS deg
    FROM sym GROUP BY src
),
dmass AS (
    SELECT community, sum(deg)::BIGINT AS degree_sum FROM deg GROUP BY community
),
intra AS (
    SELECT src % {K_COMM} AS community, count(*)::BIGINT AS intra_sym
    FROM sym WHERE src % {K_COMM} = dst % {K_COMM}
    GROUP BY src % {K_COMM}
)
SELECT d.community::BIGINT AS community,
       coalesce(i.intra_sym, 0)::BIGINT AS intra_sym,
       d.degree_sum::BIGINT AS degree_sum,
       ((SELECT two_m FROM tm) * coalesce(i.intra_sym, 0)
        - d.degree_sum * d.degree_sum)::BIGINT AS q_num,
       (SELECT two_m FROM tm)::BIGINT AS two_m
FROM dmass d LEFT JOIN intra i USING (community)
ORDER BY community
"""


def _links(d: DataFrame) -> DataFrame:
    """Synthesized (doc_id, dst_host, anchor term) link rows: even docs
    link to h{id%5}.example.com anchored by their first token, docs with
    id%6==0 additionally link to cdn{id%3}.example.net anchored by their
    second token. Map-side only; anchors fall back to 'link' for short
    documents."""
    did = F.col("doc_id").cast("long")
    toks = tokens(F.col("text"))
    t1 = F.lower(F.coalesce(F.element_at(toks, 1), F.lit("link")))
    t2 = F.lower(F.coalesce(F.element_at(toks, 2), F.lit("link")))
    l1 = F.when(
        did % 2 == 0,
        F.struct(
            F.concat(F.lit("h"), (did % 5).cast("string"), F.lit(".example.com")).alias(
                "dst_host"
            ),
            t1.alias("term"),
        ),
    )
    l2 = F.when(
        did % 6 == 0,
        F.struct(
            F.concat(
                F.lit("cdn"), (did % 3).cast("string"), F.lit(".example.net")
            ).alias("dst_host"),
            t2.alias("term"),
        ),
    )
    links = F.filter(F.array(l1, l2), lambda s: s.isNotNull())
    return d.select(did.alias("doc_id"), F.explode(links).alias("l")).select(
        "doc_id", "l.dst_host", "l.term"
    )


def q_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 inbound anchor terms per destination host with link and
    distinct-source counts plus host totals (module doc)."""
    d = table(spark, sf_dir, "documents", spread=True)
    links = _links(d)
    per_term = links.groupBy("dst_host", "term").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("doc_id").alias("n_src_docs"),
    )
    totals = links.groupBy("dst_host").agg(F.count(F.lit(1)).alias("host_links"))
    w = Window.partitionBy("dst_host").orderBy(F.desc("cnt"), F.asc("term"))
    top = per_term.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= TOP_TERMS
    )
    return (
        top.join(F.broadcast(totals), "dst_host")
        .select(
            "dst_host",
            F.col("rank").cast("long").alias("rank"),
            "term",
            F.col("cnt").cast("long").alias("cnt"),
            F.col("n_src_docs").cast("long").alias("n_src_docs"),
            F.col("host_links").cast("long").alias("host_links"),
        )
        .orderBy("dst_host", "rank")
    )


_TOKS = DUCK_TOKENS.format(x="text")

_ANCHOR_SQL = f"""
WITH base AS (
    SELECT doc_id::BIGINT AS doc_id,
           lower(coalesce(({_TOKS})[1], 'link')) AS t1,
           lower(coalesce(({_TOKS})[2], 'link')) AS t2
    FROM documents
),
links AS (
    SELECT doc_id, 'h' || (doc_id % 5)::VARCHAR || '.example.com' AS dst_host,
           t1 AS term
    FROM base WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, 'cdn' || (doc_id % 3)::VARCHAR || '.example.net', t2
    FROM base WHERE doc_id % 6 = 0
),
per_term AS (
    SELECT dst_host, term, count(*)::BIGINT AS cnt,
           count(DISTINCT doc_id)::BIGINT AS n_src_docs
    FROM links GROUP BY dst_host, term
),
totals AS (
    SELECT dst_host, count(*)::BIGINT AS host_links FROM links GROUP BY dst_host
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY dst_host ORDER BY cnt DESC, term ASC
    ) AS rank
    FROM per_term
)
SELECT r.dst_host, r.rank::BIGINT AS rank, r.term,
       r.cnt::BIGINT AS cnt, r.n_src_docs::BIGINT AS n_src_docs,
       t.host_links::BIGINT AS host_links
FROM ranked r JOIN totals t USING (dst_host)
WHERE r.rank <= {TOP_TERMS}
ORDER BY r.dst_host, r.rank
"""


QUERIES = {
    "modularity_score": q_modularity_score,
    "anchor_text": q_anchor_text,
}

ORACLES = {
    "modularity_score": _MOD_SQL,
    "anchor_text": _ANCHOR_SQL,
}
