"""Batch 101: unigram Viterbi segmentation — full pure-Python Viterbi
mirror over every sf0.001 document plus hand fixtures for the planted
ambiguity and the tie-break rule."""

import glob
import re

import pandas as pd

SF = "/root/testdata/sf0.001"


def _py_viterbi(s):
    """Same semantics: min total cost, ties to the LONGEST piece."""
    from ocr_to_csv_spark.functions.segmentops import PIECES

    n = len(s)
    dp = [0] + [None] * n
    bp = [0] * (n + 1)
    for i in range(1, n + 1):
        best = None  # (total, 8 - plen)
        for p, c in PIECES.items():
            l = len(p)
            if i >= l and s[i - l : i] == p and dp[i - l] is not None:
                key = (dp[i - l] + c, 8 - l)
                if best is None or key < best:
                    best = key
        dp[i] = best[0]
        bp[i] = 8 - best[1]
    pieces = []
    pos = n
    while pos > 0:
        l = bp[pos]
        pieces.append(s[pos - l : pos])
        pos -= l
    return dp[n], list(reversed(pieces))


def test_unigram_segment_matches_python_viterbi(spark):
    from ocr_to_csv_spark.functions.segmentops import (
        PREF,
        q_unigram_segment,
    )

    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    docs = pd.concat(
        pd.read_parquet(f, columns=["doc_id", "text"]) for f in files
    )
    gold = {}
    for _, r in docs.iterrows():
        s = re.sub(r"\s+", "", r.text)[:PREF]
        total, pieces = _py_viterbi(s)
        gold[int(r.doc_id)] = (s, len(pieces), total, "|".join(pieces))
    got = q_unigram_segment(spark, SF).collect()
    assert len(got) == len(gold)
    for r in got:
        s, np_, total, seg = gold[r.doc_id]
        assert (r.stream, r.n_pieces, r.total_milli, r.seg) == (
            s, np_, total, seg,
        ), r.doc_id


def test_planted_ambiguity_resolves_on_cost():
    """'tablescan' must parse table|scan (cost), not tables|can, and
    never char-by-char; unk runs fall back to single chars."""
    from ocr_to_csv_spark.functions.segmentops import PIECES

    total, pieces = _py_viterbi("tablescan")
    assert pieces == ["table", "scan"]
    assert total == PIECES["table"] + PIECES["scan"]
    total2, pieces2 = _py_viterbi("orderwy")
    assert pieces2 == ["order", "w", "y"]
    # every vocab piece segments as itself (cost ≤ any split)
    for p in ("customer", "window", "the"):
        _, ps = _py_viterbi(p)
        assert ps == [p]


def test_segmentation_is_total_and_lossless(spark):
    """Concatenating the pieces reproduces the stream exactly — the
    single-char fallback guarantees totality."""
    from ocr_to_csv_spark.functions.segmentops import q_unigram_segment

    for r in q_unigram_segment(spark, SF).collect():
        assert r.seg.replace("|", "") == r.stream
        assert r.n_pieces == r.seg.count("|") + 1
