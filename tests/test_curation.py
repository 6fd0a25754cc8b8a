"""Semantic properties of the curation batch-2 operators (oracle parity
is covered by test_functions_oracle.py / tools/check_queries.py; these
pin the behaviours the oracles can't express)."""

import pytest

from ocr_to_csv_spark.functions import curation

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cdc_edit_locality(spark):
    """The content-defined property: appending tokens at the end of a
    document must leave every chunk except the last untouched (same
    hashes, same lengths) — the reason CDC beats fixed-size chunking
    for dedup under edits."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    a = curation.cdc_chunk_records(
        _docs(spark, [(1, base.strip())])
    ).orderBy("chunk_idx").collect()
    b = curation.cdc_chunk_records(
        _docs(spark, [(1, (base + "lambda mu nu xi").strip())])
    ).orderBy("chunk_idx").collect()
    assert len(a) >= 2, "fixture must produce multiple chunks"
    shared = len(a) - 1
    assert [
        (r["chunk_idx"], r["chunk_len"], r["chunk_hash"]) for r in a[:shared]
    ] == [(r["chunk_idx"], r["chunk_len"], r["chunk_hash"]) for r in b[:shared]]


def test_cdc_chunks_cover_document(spark):
    """Chunk lengths partition the token stream exactly: per doc the
    lengths sum to the token count and chunk_idx is 1..n_chunks."""
    rows = curation.cdc_chunk_records(
        _docs(spark, [(7, "a b c d e f g h i j k l m n o p"), (8, "x y")])
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert sum(r["chunk_len"] for r in by_doc[7]) == 16
    assert sum(r["chunk_len"] for r in by_doc[8]) == 2
    for doc in by_doc.values():
        assert sorted(r["chunk_idx"] for r in doc) == list(
            range(1, len(doc) + 1)
        )


def test_cooccurrence_symmetric(spark):
    rows = curation.q_cooccurrence(spark, SF).collect()
    cnt = {(r["w1"], r["w2"]): r["cnt"] for r in rows}
    assert cnt, "co-occurrence table must be non-empty"
    for (w1, w2), c in cnt.items():
        assert cnt[(w2, w1)] == c


def test_dsir_separates_target_language(spark):
    """English documents must score strictly higher on the lang='en'
    target than Chinese ones (disjoint character sets → zh tokens have
    near-zero target mass)."""
    w = curation.q_dsir_weights(spark, SF)
    docs = w.sparkSession.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang"
    )
    rows = w.join(docs, "doc_id").collect()
    mean = lambda lang: sum(
        r["dsir_w"] for r in rows if r["lang"] == lang
    ) / max(1, sum(1 for r in rows if r["lang"] == lang))
    assert 0.0 <= min(r["dsir_w"] for r in rows)
    assert max(r["dsir_w"] for r in rows) <= 1.0
    assert mean("en") > mean("zh")


def test_bfs_dist_invariants(spark):
    rows = curation.q_bfs_dist(spark, SF).collect()
    d = {r["doc_id"]: r["dist"] for r in rows}
    assert all(v == -1 or 0 <= v <= curation.BFS_ROUNDS for v in d.values())
    assert all(d[i] == 0 for i in d if i % 7 == 0)
    assert any(v > 0 for v in d.values()), "some non-source must be reached"
