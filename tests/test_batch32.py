"""Batch 32: hand-computed fixtures — Rocchio dense expansion surfacing
a doc with zero lexical overlap, and the DP contribution clamp."""

import datetime

from ocr_to_csv_spark.functions.irops import (
    DP_CLAMP,
    RX_PROBES,
    RX_SCALE,
    q_bounded_contrib,
    q_rocchio_expand,
)

TS = datetime.datetime


def test_rocchio_surfaces_lexically_unmatched_doc(spark, tmp_path):
    tok = RX_PROBES[0]
    # doc 1 contains the token; doc 2 does NOT but has an identical
    # embedding; doc 3 has an orthogonal embedding
    docs = [
        (1, f"{tok} alpha beta", "en", "s1", 10),
        (2, "gamma delta epsilon", "en", "s1", 10),
        (3, "zeta eta theta", "en", "s1", 10),
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    embs = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [1.0, 0.0, 0.0, 0.0], 0),
        (3, [0.0, 1.0, 0.0, 0.0], 0),
    ]
    spark.createDataFrame(
        embs, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))

    got = {
        r["doc_id"]: r
        for r in q_rocchio_expand(spark, str(tmp_path)).collect()
        if r["token"] == tok
    }
    # dense ranking from doc 1's centroid: docs 1,2 tie at sim 1.0
    # (doc_id tie-break), doc 3 at sim 0
    assert got[2]["rank_dense"] == 2  # surfaced despite zero tf
    assert got[2]["rank_lex"] == 100000  # sentinel: not lexically matched
    assert got[1]["rank"] == 1  # lexical+dense beats dense-only
    assert got[3]["rank_dense"] == 3


def test_bounded_contrib_clamps_whales(spark, tmp_path):
    rows = [
        # user 1: three 100.00 events -> tot 30000 cents, clipped to 10000
        (1, TS(2024, 1, 1), 1, "view", 100.0, "{}"),
        (2, TS(2024, 1, 2), 1, "view", 100.0, "{}"),
        (3, TS(2024, 1, 3), 1, "view", 100.0, "{}"),
        # user 2: one 50.00 event -> under the clamp
        (4, TS(2024, 1, 1), 2, "view", 50.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    r = q_bounded_contrib(spark, str(tmp_path)).collect()[0]
    assert r["raw_sum"] == 35000
    assert r["bounded_sum"] == DP_CLAMP + 5000
    assert (r["n_users"], r["n_clipped"]) == (2, 1)
    assert r["clip_frac"] == 0.5
