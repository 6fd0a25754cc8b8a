"""Batch 104: SymSpell correction + prefix autocomplete — pure-Python
mirror (brute-force edit-distance over the vocabulary, NOT delete-key
blocked, so the blocking is proven lossless) and hand fixtures."""

import glob
import re
from collections import Counter

import pandas as pd

SF = "/root/testdata/sf0.001"


def _vocab_py():
    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    docs = pd.concat(
        pd.read_parquet(f, columns=["doc_id", "text"]) for f in files
    )
    vocab = Counter()
    for t in docs.text:
        vocab.update(x for x in re.split(r"\s+", t) if x != "")
    return docs, vocab


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


def test_symspell_matches_bruteforce(spark):
    """The delete-key equi-join must find exactly what a full
    edit-distance scan finds — blocking loses nothing."""
    from ocr_to_csv_spark.functions.spellops import (
        NO_MATCH,
        q_symspell_correct,
    )

    docs, vocab = _vocab_py()
    got = {r.doc_id: (r.q, r.correction, r.dist, r.freq)
           for r in q_symspell_correct(spark, SF).collect()}
    n_checked = 0
    for doc_id, (q, corr, dist, freq) in got.items():
        cands = [
            (vocab[w], w) for w in vocab if _lev(q, w) <= 1
        ]
        if not cands:
            assert (corr, dist, freq) == (NO_MATCH, -1, -1), doc_id
        else:
            bf, bw = max(cands)
            assert corr == bw and freq == bf and dist == _lev(q, bw), doc_id
        n_checked += 1
    assert n_checked == len(got) > 0
    # all four synthesis branches must occur
    dists = {d for _, _, d, _ in got.values()}
    assert dists == {-1, 0, 1}


def test_autocomplete_matches_python(spark):
    from ocr_to_csv_spark.functions.spellops import (
        TOP_SUGGEST,
        q_prefix_autocomplete,
    )

    _, vocab = _vocab_py()
    table = {}
    for w, f in vocab.items():
        for i in range(1, len(w) + 1):
            table.setdefault(w[:i], []).append((-f, w))
    expect = []
    for pfx, lst in table.items():
        for rank, (nf, w) in enumerate(sorted(lst)[:TOP_SUGGEST], 1):
            expect.append((pfx, rank, w, -nf))
    got = [
        (r.prefix, r.rank, r.word, r.freq)
        for r in q_prefix_autocomplete(spark, SF).collect()
    ]
    assert sorted(got) == sorted(expect)
    # shared prefixes exist (e.g. 's': sort/scan/slow/small/spark/stream)
    by_pfx = Counter(p for p, _, _, _ in got)
    assert by_pfx["s"] == TOP_SUGGEST
