"""Batch 10 (functions/irops.py): RRF formula/ordering, winnowing-pair
guarantee + boilerplate cap, k-core peel vs Python replay, vocabulary
coverage arithmetic, lag-delta sequencing — properties the DuckDB
oracle equality can't express."""

import datetime

from ocr_to_csv_spark.functions.irops import (
    FP_CAP,
    KCORE_K,
    KCORE_ROUNDS,
    RRF_K,
    RRF_TOP,
    VOCAB_V,
    q_kcore,
    q_lag_delta,
    q_rrf_fusion,
    q_vocab_coverage,
    q_winnow_pairs,
)


def _docs(spark, tmp_path, rows):
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in enumerate(rows)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(p)
    return str(tmp_path)


def test_rrf_fuses_disagreeing_rankings(spark, tmp_path):
    # doc0: highest tf of 'data' but LAST first-position;
    # doc1: single early 'data'; doc2: middling on both.
    d = _docs(
        spark,
        tmp_path,
        [
            "x x x x x x x x data data data",  # tf=3, fpos=8
            "data y y y y",  # tf=1, fpos=0
            "z data data w",  # tf=2, fpos=1
        ],
    )
    rows = [r for r in q_rrf_fusion(spark, d).collect() if r["token"] == "data"]
    by_doc = {r["doc_id"]: r for r in rows}
    assert by_doc[0]["rank_tf"] == 1 and by_doc[0]["rank_pos"] == 3
    assert by_doc[1]["rank_tf"] == 3 and by_doc[1]["rank_pos"] == 1
    assert by_doc[2]["rank_tf"] == 2 and by_doc[2]["rank_pos"] == 2
    for r in rows:
        want = 1.0 / (RRF_K + r["rank_tf"]) + 1.0 / (RRF_K + r["rank_pos"])
        assert r["rrf_score"] == want
    # (1,3) and (3,1) tie exactly (commutative add) and beat (2,2):
    # 1/61 + 1/63 > 2/62 (AM-HM); tie broken by doc_id.
    assert by_doc[0]["rrf_score"] == by_doc[1]["rrf_score"]
    ordered = sorted(rows, key=lambda r: (-r["rrf_score"], r["doc_id"]))
    assert [r["doc_id"] for r in ordered] == [0, 1, 2]
    assert len(rows) <= RRF_TOP


def test_winnow_pairs_shared_passage_and_cap(spark, tmp_path):
    passage = " ".join(f"p{i}" for i in range(30))
    texts = [
        f"alpha beta {passage} gamma delta",
        f"{passage} omega psi chi phi upsilon",
        "entirely different words all the way through here now friend",
    ]
    d = _docs(spark, tmp_path, texts)
    pairs = {(r["doc_a"], r["doc_b"]): r["n_shared"] for r in q_winnow_pairs(spark, d).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    assert all(2 not in p for p in pairs)


def test_winnow_pairs_boilerplate_fp_suppressed(spark, tmp_path):
    # FP_CAP+10 docs all sharing one passage: every fingerprint of that
    # passage occurs in >FP_CAP docs, so NO pairs are emitted (instead
    # of (cap+10 choose 2) of them).
    passage = " ".join(f"b{i}" for i in range(30))
    d = _docs(spark, tmp_path, [f"u{k} {passage} v{k}" for k in range(FP_CAP + 10)])
    assert q_winnow_pairs(spark, d).count() == 0


def _und(n):
    e = set()
    for d in range(n):
        for ok, t in (
            (d % 3 != 0, (2 * d + 1) % n),
            (d % 2 == 0, (7 * d + 3) % n),
            (d % 6 == 1, (d + n // 2) % n),
        ):
            if ok and d != t:
                e.add((d, t))
                e.add((t, d))
    return e


def test_kcore_matches_python_peel(spark, tmp_path):
    n = 16
    d = _docs(spark, tmp_path, [f"doc {i}" for i in range(n)])
    e = _und(n)
    for _ in range(KCORE_ROUNDS):
        deg = {}
        for s, _t in e:
            deg[s] = deg.get(s, 0) + 1
        keep = {v for v, c in deg.items() if c >= KCORE_K}
        e = {(s, t) for s, t in e if s in keep and t in keep}
    want = {}
    for s, _t in e:
        want[s] = want.get(s, 0) + 1
    got = {r["doc_id"]: r["degree"] for r in q_kcore(spark, d).collect()}
    assert got == want


def test_vocab_coverage_oov_arithmetic(spark, tmp_path):
    assert VOCAB_V == 512
    big = " ".join(f"t{i:03d}" for i in range(520))  # 520 singleton tokens
    d = _docs(spark, tmp_path, [big, "zz zz zz zz zz"])
    rows = {r["doc_id"]: r for r in q_vocab_coverage(spark, d).collect()}
    # vocab = 'zz' (freq 5) + lexicographically-smallest 511 singletons
    r0 = rows[0]
    assert (r0["n_toks"], r0["n_vocab"]) == (520, 511)
    assert r0["oov_rate"] == 1.0 - 511.0 / 520.0
    r1 = rows[1]
    assert (r1["n_toks"], r1["n_vocab"], r1["oov_rate"]) == (5, 5, 0.0)


def test_lag_delta_sequences_per_user(spark, tmp_path):
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 7, "a", 10.0, "{}"),
        (2, t0 + datetime.timedelta(seconds=30), 7, "a", 12.5, "{}"),
        (3, t0 + datetime.timedelta(seconds=90), 7, "b", 11.0, "{}"),
        (4, t0, 9, "a", 5.0, "{}"),
        (5, t0, None, "a", 1.0, "{}"),  # null user excluded
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {r["event_id"]: r for r in q_lag_delta(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert not got[1]["has_prev"] and got[1]["delta_value"] == 0.0
    assert got[2]["delta_value"] == 2.5 and got[2]["gap_s"] == 30
    assert got[3]["delta_value"] == -1.5 and got[3]["gap_s"] == 60
    assert not got[4]["has_prev"] and got[4]["gap_s"] == 0
