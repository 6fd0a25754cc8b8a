"""Batch 149: LLR collocations + KWIC — python mirrors (full G²
contingency recomputation; context slicing), plus the G² sanity pins
(non-negative, and the top collocation co-occurs far above chance)."""

import glob
import math
from collections import Counter

import pandas as pd

SF = "/root/testdata/sf0.001"
NANO = 1_000_000_000


def _toks():
    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    docs = pd.concat(
        pd.read_parquet(f, columns=["doc_id", "text"]) for f in files
    )
    return {
        int(r.doc_id): [t for t in str(r.text).lower().split() if t]
        for r in docs.itertuples(index=False)
    }


def test_collocation_llr_matches_python(spark):
    from ocr_to_csv_spark.functions.collocops import (
        LLR_TOP, MIN_PAIR, q_collocation_llr,
    )

    toks = _toks()
    bigrams = []
    for tk in toks.values():
        bigrams += list(zip(tk, tk[1:]))
    bc = Counter(bigrams)
    c1 = Counter(w1 for w1, _ in bigrams)
    c2 = Counter(w2 for _, w2 in bigrams)
    n = len(bigrams)

    def cell(k, row, col):
        if k <= 0:
            return 0
        return round(k * math.log(k * n / (row * col)) * NANO)

    exp = []
    for (w1, w2), k11 in bc.items():
        if k11 < MIN_PAIR:
            continue
        a, b = c1[w1], c2[w2]
        g2 = 2 * (
            cell(k11, a, b)
            + cell(a - k11, a, n - b)
            + cell(b - k11, n - a, b)
            + cell(n - a - b + k11, n - a, n - b)
        )
        exp.append((w1, w2, k11, a, b, n, g2))
    exp.sort(key=lambda t: (-t[6], t[0], t[1]))
    got = [tuple(r) for r in q_collocation_llr(spark, SF).collect()]
    assert got == [tuple(e) for e in exp[:LLR_TOP]]
    # G² is two-sided (attraction OR repulsion): the winner deviates
    # clearly from independence, in either direction
    w1, w2, k11, a, b, nn, g2 = got[0]
    assert g2 > 0
    assert abs(k11 * nn - a * b) * 10 > a * b  # >10% off expectation


def test_kwic_matches_python(spark):
    from ocr_to_csv_spark.functions.collocops import (
        KWIC_CTX, KWIC_WORD, q_kwic_concordance,
    )

    toks = _toks()
    exp = []
    for did in sorted(toks):
        tk = toks[did]
        for i, w in enumerate(tk, 1):
            if w == KWIC_WORD:
                left = " ".join(tk[max(i - 1 - KWIC_CTX, 0) : i - 1])
                right = " ".join(tk[i : i + KWIC_CTX])
                exp.append((did, i, left, right))
    got = [tuple(r) for r in q_kwic_concordance(spark, SF).collect()]
    assert got == exp
    assert len(got) > 0
