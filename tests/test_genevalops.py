"""Batch 134: pair BLEU-4 + ROUGE-L — python mirrors of the candidate
generation (DF-capped shared-8-gram join), the clipped n-gram counts,
the integer brevity penalty, and the LCS DP; near-dup sanity pinned
(the top pair is a genuine near-duplicate, metrics near 1)."""

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
        r.doc_id: [t for t in str(r.text).split() if t][:100]
        for r in docs.itertuples(index=False)
    }


def _grams(toks, n):
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _pairs(toks):
    from ocr_to_csv_spark.functions.genevalops import DF_CAP, MIN_SHARED

    byg = {}
    for did, tk in toks.items():
        for g in set(_grams(tk, 8)):
            byg.setdefault(g, set()).add(did)
    shared = Counter()
    for g, docs in byg.items():
        if len(docs) > DF_CAP:
            continue
        docs = sorted(docs)
        for i, a in enumerate(docs):
            for b in docs[i + 1 :]:
                shared[(a, b)] += 1
    return sorted(p for p, c in shared.items() if c >= MIN_SHARED)


def test_bleu_pairs_matches_python(spark):
    from ocr_to_csv_spark.functions.genevalops import q_bleu_pairs

    toks = _toks()
    exp = {}
    for a, b in _pairs(toks):
        ta, tb = toks[a], toks[b]
        la, lb = len(ta), len(tb)
        nums, lnsum = [], 0
        for n in range(1, 5):
            ca, cb = Counter(_grams(ta, n)), Counter(_grams(tb, n))
            num = sum(min(c, ca[g]) for g, c in cb.items())
            nums.append(num)
            lnsum += round(math.log(num / (lb - n + 1)) * NANO)
        bp = 0 if lb >= la else NANO - (NANO * la + lb - 1) // lb
        exp[(a, b)] = (la, lb, *nums, 4 * bp + lnsum)
    got = {
        (r.doc_a, r.doc_b): (
            r.len_a, r.len_b, r.p1_num, r.p2_num, r.p3_num, r.p4_num,
            r.log4_nano,
        )
        for r in q_bleu_pairs(spark, SF).collect()
    }
    assert got == exp
    assert len(got) > 0
    # at least one pair is a genuine planted near-dup: BLEU ~ 1
    assert max(v[-1] for v in got.values()) > -0.2 * NANO


def test_rouge_l_matches_python(spark):
    from ocr_to_csv_spark.functions.genevalops import q_rouge_l

    toks = _toks()
    exp = {}
    for a, b in _pairs(toks):
        ta, tb = toks[a], toks[b]
        prev = [0] * (len(tb) + 1)
        for x in ta:
            row = [0]
            for j, y in enumerate(tb, 1):
                row.append(prev[j - 1] + 1 if x == y
                           else max(prev[j], row[-1]))
            prev = row
        lcs = prev[-1]
        exp[(a, b)] = (len(ta), len(tb), lcs,
                       2000 * lcs // (len(ta) + len(tb)))
    got = {
        (r.doc_a, r.doc_b): (r.len_a, r.len_b, r.lcs, r.f_milli)
        for r in q_rouge_l(spark, SF).collect()
    }
    assert got == exp
    for (a, b), (la, lb, lcs, f) in got.items():
        assert 0 <= lcs <= min(la, lb)
    assert max(v[3] for v in got.values()) >= 900  # near-dup pair F ~ 1
