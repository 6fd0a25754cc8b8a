"""Spot-check the query library against its DuckDB oracles at sf0.001
(fast subset; the full 31-query sweep runs via tools/check_queries.py and
the driver's own gate at sf0.01)."""

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
SPOT = [
    "pricing_summary",
    "window_dedup",
    "anti_join",
    "explode_tokens",
    "quality_score",
    "fingerprint",
    "minhash_sig",
    "simhash",
    "ngram_jaccard",
    "cosine_topk",
    "ivf_assign",
    "ann_lsh_search",
    "simhash_near_pairs",
    "moving_sum",
    "percentiles",
    "profile",
    "dedup_clusters",
    "dedup_survivors",
    "stratified_sample",
    "mix_sample",
    "bpe_merges",
    "ann_lsh_multiprobe",
    "ivf_multiprobe",
    "decontam",
    "repetition",
    "pii_scrub",
    "url_hosts",
    "semdedup",
    "lm_commonness",
    "tfidf_topk",
    "link_graph",
    "bloom_semi_join",
    "interval_join",
    "histogram",
    "pagerank",
    "cube",
    "event_funnel",
    "connected_components",
    "scd2",
    "ewma",
    "sliding_window",
    "salted_join",
    "heavy_hitters",
    "incremental_agg",
    "unpivot",
    "ntile",
    "dup_spans",
    "hll_distinct",
    "pq_encode",
    "pq_search",
    "weighted_sample",
    "lm_bigram",
    "triangles",
    "key_skew",
    "ann_recall",
    "resample_daily",
    "fuzzy_match",
    "postings",
    "window_pct",
    "sq_encode",
    "sq_search",
    "cooccurrence",
    "dsir_weights",
    "cdc_chunks",
    "cdc_dedup",
    "bfs_dist",
    "skyline",
    "ppjoin_pairs",
    "bm25_topk",
    "quantile_sketch",
    "mad_outliers",
    "quality_classifier",
    "phrase_search",
    "lsh_incremental",
    "sssp_dist",
    "ivfpq_search",
    "split_assign",
    "winnowing",
    "hash_embed",
]


def test_interval_join_plan_has_no_nested_loop(spark):
    """The bucketed range join must compile to a shuffle equi-join —
    never the O(n*m) BroadcastNestedLoopJoin Spark picks for a raw
    BETWEEN predicate."""
    from ocr_to_csv_spark.functions import relational

    plan = relational.q_interval_join(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_cosine_topk_fast_matches_fold(spark):
    """The production matmul kernel must return the same ranking as the
    oracle-parity fold variant (same data, same 4-decimal rounding)."""
    from ocr_to_csv_spark.functions import similarity

    fold = similarity.q_cosine_topk(spark, SF).collect()
    fast = similarity.cosine_topk_fast(spark, SF).collect()
    key = lambda rows: sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["sim"]) for r in rows
    )
    assert key(fold) == key(fast)


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if hasattr(v, "item"):
        return _norm_cell(v.item())
    return str(v)


def _norm(df):
    cols = sorted(df.columns)
    df = df[cols]
    return cols, sorted(
        tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False)
    )


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SPOT)
def test_query_matches_oracle(spark, duck, name):
    got = entrymod.queries()[name](spark, SF).toPandas()
    exp = duck.sql(entrymod.oracle_sql()[name]).df()
    gc, gr = _norm(got)
    ec, er = _norm(exp)
    assert gc == ec
    assert gr == er


def test_percentiles_approx_close_to_exact(spark):
    """The sketch-based production path must agree with the exact
    baseline within relative tolerance (sandbox accuracy=10k makes the
    sketch near-exact at these group sizes)."""
    from ocr_to_csv_spark.functions import relational

    exact = {r["l_returnflag"]: r for r in relational.q_percentiles(spark, SF).collect()}
    approx = {r["l_returnflag"]: r for r in relational.percentiles_approx(spark, SF).collect()}
    assert set(exact) == set(approx)
    for k in exact:
        for col in ("p50", "p95"):
            e, a = float(exact[k][col]), float(approx[k][col])
            assert abs(e - a) / e < 0.02, (k, col, e, a)
