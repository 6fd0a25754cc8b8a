"""Batch 160: Huffman bits + Elias gamma — python mirrors (heapq
Huffman as the independent implementation; bit-length gap coding), and
the Shannon bound H·N <= bits < (H+1)·N pinned."""

import glob
import heapq
import math
from collections import Counter

import pandas as pd

SF = "/root/testdata/sf0.001"
NANO = 1_000_000_000


def _docs():
    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    return pd.concat(
        pd.read_parquet(f, columns=["doc_id", "text"]) for f in files
    )


def test_huffman_bits_matches_python(spark):
    from ocr_to_csv_spark.functions.codingops import q_huffman_bits

    freqs = Counter()
    for t in _docs().text:
        freqs.update(str(t))
    ws = sorted(freqs.values())
    heap = list(ws)
    heapq.heapify(heap)
    total_bits = 0
    while len(heap) >= 2:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        total_bits += a + b
        heapq.heappush(heap, a + b)
    n = sum(ws)
    ent = sum(
        round(f * math.log2(n / f) * NANO) for f in freqs.values()
    )
    r = q_huffman_bits(spark, SF).collect()[0]
    assert (r.n_symbols, r.total_chars, r.huffman_bits) == (
        len(ws), n, total_bits,
    )
    assert abs(r.entropy_nano - ent) <= len(ws)
    # Shannon bound: H*N <= bits < (H+1)*N  (nano slack on H)
    assert r.entropy_nano - len(ws) <= r.huffman_bits * NANO
    assert r.huffman_bits * NANO < r.entropy_nano + (n + 1) * NANO


def test_elias_gamma_matches_python(spark):
    from ocr_to_csv_spark.functions.codingops import (
        EG_TERMS, q_elias_gamma_est,
    )

    docs = _docs()
    posting = {}
    for r in docs.itertuples(index=False):
        for t in set(x for x in str(r.text).lower().split() if x):
            posting.setdefault(t, set()).add(int(r.doc_id))
    top = sorted(
        posting, key=lambda t: (-len(posting[t]), t)
    )[:EG_TERMS]
    exp = {}
    for t in top:
        ds = sorted(posting[t])
        bits = 0
        prev = -1
        for d in ds:
            g = d + 1 if prev < 0 else d - prev
            bits += 2 * (g.bit_length() - 1) + 1
            prev = d
        exp[t] = (len(ds), bits, 32 * len(ds), 1000 * bits // (32 * len(ds)))
    got = {
        r.term: (r.df, r.gamma_bits, r.raw_bits, r.ratio_milli)
        for r in q_elias_gamma_est(spark, SF).collect()
    }
    assert got == exp
    # dense postings compress hard: top term well under the raw budget
    best = min(v[3] for v in got.values())
    assert best < 500
