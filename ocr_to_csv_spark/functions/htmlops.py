"""HTML-surface extraction audits, batch 126: head-metadata harvesting
(title / meta description / canonical) and DOM nesting statistics
(max depth, unbalanced-tag detection) — the map-side structural
signals a boilerplate stripper reads before committing to a parse
strategy, over deterministically synthesized markup (the link_graph
synthesis precedent: the corpus supplies the text, the query supplies
the wrapper, so the extraction is oracle-checkable end to end).

Scale design (100 TB):
- ``html_meta``: the markup wrapper (title from the first two tokens,
  description from the next three, canonical URL from doc_id — plus a
  deliberately malformed 7% slice with NO closing title tag) is a
  map-side concat; harvesting is three ``regexp_extract`` calls per
  row (lazy quantifiers, identical RE2/Java semantics for these
  patterns) — pure whole-stage-codegen, no Python, no shuffle except
  the final order. Malformed heads yield empty title (the quarantine
  signal), never a crash.
- ``dom_depth_stats``: the synthesized body nests <div>/<section>
  blocks to a doc-dependent depth (id % 7, with the id % 11 slice
  dropping one closing tag); the depth scan is ONE in-row fold over
  the extracted tag sequence (+1/−1 with a running max — the bounded
  in-row discipline), emitting max depth and the final imbalance.
  Aggregated to a depth histogram: rows bounded by the depth domain.

Reference parity: the reference's DOM stage (SURVEY §2 S2/F5) makes
these structural judgements implicitly inside parsing; here they are
first-class auditable signals of the same markup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import DUCK_TOKENS, table, tokens

DEPTH_MOD = 7  # nesting depth = id % DEPTH_MOD + 1
DROP_MOD = 11  # id % DROP_MOD == 0 drops one closing tag
NOTITLE_MOD = 14  # id % NOTITLE_MOD == 0 emits a malformed head


def _html(did, toks):
    """Deterministic markup wrapper (module doc) as a Column."""
    t1 = F.coalesce(F.element_at(toks, 1), F.lit("untitled"))
    t2 = F.coalesce(F.element_at(toks, 2), F.lit(""))
    desc = F.concat_ws(
        " ",
        F.coalesce(F.element_at(toks, 3), F.lit("")),
        F.coalesce(F.element_at(toks, 4), F.lit("")),
        F.coalesce(F.element_at(toks, 5), F.lit("")),
    )
    title_tag = F.when(
        did % NOTITLE_MOD == 0,
        F.concat(F.lit("<title>"), t1, F.lit(" "), t2),
    ).otherwise(
        F.concat(F.lit("<title>"), t1, F.lit(" "), t2, F.lit("</title>"))
    )
    return F.concat(
        F.lit("<html><head>"),
        title_tag,
        F.lit('<meta name="description" content="'),
        desc,
        F.lit('"><link rel="canonical" href="http://ex.com/d/'),
        did.cast("string"),
        F.lit('"></head><body></body></html>'),
    )


def q_html_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harvested head metadata per document (module doc)."""
    d = table(spark, sf_dir, "documents", spread=True)
    did = F.col("doc_id").cast("long")
    html = _html(did, tokens(F.col("text")))
    out = d.select(
        did.alias("doc_id"),
        F.regexp_extract(html, "<title>(.*?)</title>", 1).alias("title"),
        F.regexp_extract(
            html, '<meta name="description" content="(.*?)"', 1
        ).alias("description"),
        F.regexp_extract(
            html, '<link rel="canonical" href="(.*?)"', 1
        ).alias("canonical"),
    )
    return out.select(
        "doc_id",
        "title",
        "description",
        "canonical",
        (F.col("title") == "").cast("long").alias("malformed"),
    ).orderBy("doc_id")


_TOKS = DUCK_TOKENS.format(x="text")

_HTML_SQL_EXPR = f"""
    '<html><head>' ||
    CASE WHEN doc_id % {NOTITLE_MOD} = 0
         THEN '<title>' || coalesce(({_TOKS})[1], 'untitled') || ' '
              || coalesce(({_TOKS})[2], '')
         ELSE '<title>' || coalesce(({_TOKS})[1], 'untitled') || ' '
              || coalesce(({_TOKS})[2], '') || '</title>' END ||
    '<meta name="description" content="' ||
    concat_ws(' ', coalesce(({_TOKS})[3], ''), coalesce(({_TOKS})[4], ''),
              coalesce(({_TOKS})[5], '')) ||
    '"><link rel="canonical" href="http://ex.com/d/' || doc_id::VARCHAR ||
    '"></head><body></body></html>'
"""

_META_SQL = f"""
WITH h AS (
    SELECT doc_id::BIGINT AS doc_id, ({_HTML_SQL_EXPR}) AS html
    FROM documents
)
SELECT doc_id,
       coalesce(regexp_extract(html, '<title>(.*?)</title>', 1), '') AS title,
       coalesce(regexp_extract(html,
           '<meta name="description" content="(.*?)"', 1), '')
           AS description,
       coalesce(regexp_extract(html,
           '<link rel="canonical" href="(.*?)"', 1), '') AS canonical,
       (CASE WHEN coalesce(regexp_extract(html, '<title>(.*?)</title>', 1),
                           '') = '' THEN 1 ELSE 0 END)::BIGINT AS malformed
FROM h
ORDER BY doc_id
"""


def q_dom_depth_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOM depth histogram over synthesized nested markup
    (module doc): (max_depth, imbalance, n_docs)."""
    d = table(spark, sf_dir, "documents", spread=True)
    did = F.col("doc_id").cast("long")
    k = (did % DEPTH_MOD + 1).cast("int")
    opens = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.when(i % 2 == 1, F.lit("<div>")).otherwise(
            F.lit("<section>")
        ),
    )
    closes_full = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.when((k - i + 1) % 2 == 1, F.lit("</div>")).otherwise(
            F.lit("</section>")
        ),
    )
    closes = F.when(
        did % DROP_MOD == 0, F.slice(closes_full, 1, k - 1)
    ).otherwise(closes_full)
    html = F.concat(
        F.lit("<body>"),
        F.array_join(opens, ""),
        F.lit("x"),
        F.array_join(closes, ""),
        F.lit("</body>"),
    )
    tags = F.regexp_extract_all(html, F.lit("</?[a-z]+>"), 0)
    acc0 = F.array(F.lit(0).cast("long"), F.lit(0).cast("long"))  # depth,max

    def step(acc, tag):
        delta = F.when(tag.startswith("</"), F.lit(-1)).otherwise(F.lit(1))
        depth = F.get(acc, 0) + delta
        mx = F.greatest(F.get(acc, 1), depth)
        return F.array(depth.cast("long"), mx.cast("long"))

    folded = F.aggregate(tags, acc0, step)
    st = d.select(
        F.get(folded, 1).cast("long").alias("max_depth"),
        F.get(folded, 0).cast("long").alias("imbalance"),
    )
    return (
        st.groupBy("max_depth", "imbalance")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("max_depth", "imbalance")
    )


_DOM_SQL = f"""
WITH h AS (
    SELECT doc_id::BIGINT AS doc_id,
           (doc_id % {DEPTH_MOD} + 1)::INTEGER AS k
    FROM documents
),
built AS (
    SELECT doc_id, k,
           '<body>' ||
           list_aggregate(list_transform(generate_series(1, k),
               i -> CASE WHEN i % 2 = 1 THEN '<div>'
                         ELSE '<section>' END), 'string_agg', '') ||
           'x' ||
           coalesce(list_aggregate(
               CASE WHEN doc_id % {DROP_MOD} = 0
                    THEN list_transform(generate_series(1, k),
                        i -> CASE WHEN (k - i + 1) % 2 = 1 THEN '</div>'
                                  ELSE '</section>' END)[1:k-1]
                    ELSE list_transform(generate_series(1, k),
                        i -> CASE WHEN (k - i + 1) % 2 = 1 THEN '</div>'
                                  ELSE '</section>' END) END,
               'string_agg', ''), '') ||
           '</body>' AS html
    FROM h
),
folded AS (
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST([0, 0] AS BIGINT[]),
                   list_transform(regexp_extract_all(html, '</?[a-z]+>', 0),
                                  t -> CASE WHEN t LIKE '</%' THEN [-1::BIGINT]
                                            ELSE [1::BIGINT] END)),
               (acc, dl) -> [acc[1] + dl[1],
                             greatest(acc[2], acc[1] + dl[1])]
           ) AS f
    FROM built
)
SELECT f[2]::BIGINT AS max_depth, f[1]::BIGINT AS imbalance,
       count(*)::BIGINT AS n_docs
FROM folded
GROUP BY 1, 2
ORDER BY max_depth, imbalance
"""


QUERIES = {
    "html_meta": q_html_meta,
    "dom_depth_stats": q_dom_depth_stats,
}

ORACLES = {
    "html_meta": _META_SQL,
    "dom_depth_stats": _DOM_SQL,
}
