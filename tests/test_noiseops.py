"""Batch 119: label-noise estimation + held-out perplexity — python
mirrors and the defining semantics (joint counts partition each class;
perplexity ≥ 1; noise = off-diagonal share)."""

import glob
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _tab(name, cols):
    files = sorted(glob.glob(f"{SF}/{name}.parquet")) or sorted(
        glob.glob(f"{SF}/{name}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def test_label_noise_est_matches_python(spark):
    from ocr_to_csv_spark.functions.noiseops import (
        LN_D,
        LN_SCALE,
        q_label_noise_est,
    )

    emb = _tab("embeddings", ["vec_id", "embedding", "label"])
    vecs = [
        (
            int(r.label),
            [int(round(float(r.embedding[i]) * LN_SCALE)) for i in range(LN_D)],
        )
        for r in emb.itertuples(index=False)
    ]
    cen = {}
    for lbl in {g for g, _ in vecs}:
        mine = [v for g, v in vecs if g == lbl]
        cen[lbl] = [
            int(round(sum(v[i] for v in mine) / len(mine)))
            for i in range(LN_D)
        ]
    joint = {}
    for g, v in vecs:
        best = min(
            (sum((v[i] - c[i]) ** 2 for i in range(LN_D)), lbl)
            for lbl, c in cen.items()
        )
        k = (g, best[1])
        joint[k] = joint.get(k, 0) + 1
    totals = {}
    for (g, p), c in joint.items():
        t, off = totals.get(g, (0, 0))
        totals[g] = (t + c, off + (c if g != p else 0))
    gold = {
        (g, p): (c, totals[g][0], totals[g][1] * 1000 // totals[g][0])
        for (g, p), c in joint.items()
    }
    got = {
        (r.given_label, r.pred_label): (r.cnt, r.given_total, r.noise_milli)
        for r in q_label_noise_est(spark, SF).collect()
    }
    assert got == gold
    # joint counts partition each class
    for g, (t, _) in totals.items():
        assert sum(c for (gg, _), (c, _, _) in got.items() if gg == g) == t


def test_heldout_ppl_matches_python(spark):
    from ocr_to_csv_spark.functions.noiseops import PPL_HOLD, q_heldout_ppl

    d = _tab("documents", ["doc_id", "text"])
    toks = {
        int(r.doc_id): [t for t in str(r.text).split() if t]
        for r in d.itertuples(index=False)
    }
    c2, c1, vocab = {}, {}, set()
    for did, ts in toks.items():
        if did % PPL_HOLD == 0:
            continue
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            bg = f"{a} {b}"
            c2[bg] = c2.get(bg, 0) + 1
            c1[a] = c1.get(a, 0) + 1
    v = len(vocab)
    n_docs = n_bg = tot = 0
    for did, ts in toks.items():
        if did % PPL_HOLD != 0 or len(ts) < 2:
            continue
        n_docs += 1
        for a, b in zip(ts, ts[1:]):
            bg = f"{a} {b}"
            p = (c2.get(bg, 0) + 1) / (c1.get(a, 0) + v)
            tot += int(round(math.log(p) * 1e9))
            n_bg += 1
    r = q_heldout_ppl(spark, SF).collect()[0]
    assert (r.n_docs, r.n_bigrams, r.sum_lognano) == (n_docs, n_bg, tot)
    assert r.ppl_milli == int(round(math.exp(-tot / 1e9 / n_bg) * 1000))
    assert r.ppl_milli >= 1000  # perplexity ≥ 1
