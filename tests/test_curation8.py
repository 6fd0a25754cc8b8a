"""Batch 43: hand-computed fixtures for the Gopher rule card and an
independent pure-Python consistent-hash ring (hashlib mirror, plus the
movement-bound property when a node leaves the ring)."""

import hashlib

from ocr_to_csv_spark.functions.curation8 import (
    GQ_STOPWORDS,
    q_gopher_quality,
    q_ring_assign,
    ring_points,
)

DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def _docs(spark, tmp_path, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_gopher_rule_card_flags(spark, tmp_path):
    base = "the a " + " ".join(f"word{i % 7}" for i in range(28))  # 30 toks
    texts = [
        base,  # passes every rule (mean len 150/30 = 5.0, in band)
        "the a xx yy",  # too few words
        # no stopwords, 30 tokens, mean length exactly 5
        " ".join(f"tok{i % 9}x" for i in range(30)),
        # mean word length out of band (all 2-char tokens) + keeps stop
        "the a " + " ".join("xy" for _ in range(28)),
        # numeric tokens → alpha ratio fails (4 alpha of 30 < 0.8)
        "the a of to " + " ".join(str(10000 + i) for i in range(26)),
    ]
    sf = _docs(spark, tmp_path, texts)
    got = {
        r["doc_id"]: (
            r["f_words"], r["f_meanlen"], r["f_stop"], r["f_alpha"], r["keep"]
        )
        for r in q_gopher_quality(spark, sf).collect()
    }
    assert got[0] == (1, 1, 1, 1, 1)
    assert got[1] == (0, 0, 1, 1, 0)  # 4 toks; mean 2.5 below band
    assert got[2] == (1, 1, 0, 1, 0)
    assert got[3] == (1, 0, 1, 1, 0)
    assert got[4] == (1, 1, 1, 0, 0)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _assign(key: int, pts, nodes) -> int:
    for p, n in zip(pts, nodes):
        if p >= key:
            return n
    return nodes[0]


def test_ring_assign_matches_python_ring(spark, tmp_path):
    texts = [f"doc body {i}" for i in range(40)]
    sf = _docs(spark, tmp_path, texts)
    pts, nodes = ring_points()
    expected: dict[int, int] = {}
    for i in range(40):
        n = _assign(_h32(f"doc|{i}"), pts, nodes)
        expected[n] = expected.get(n, 0) + 1
    got = {r["node"]: r["n_docs"] for r in q_ring_assign(spark, sf).collect()}
    assert got == expected


def test_ring_movement_bound_on_node_removal():
    """Removing one node only reassigns keys that mapped to it — the
    consistent-hashing contract (mod-N hashing moves ~everything)."""
    pts, nodes = ring_points()
    gone = 3
    kept = [(p, n) for p, n in zip(pts, nodes) if n != gone]
    pts2 = [p for p, _ in kept]
    nodes2 = [n for _, n in kept]
    moved = same = 0
    for i in range(500):
        k = _h32(f"doc|{i}")
        a = _assign(k, pts, nodes)
        b = _assign(k, pts2, nodes2)
        if a == b:
            same += 1
        else:
            assert a == gone  # only the removed node's keys may move
            moved += 1
    assert moved > 0 and same > moved
