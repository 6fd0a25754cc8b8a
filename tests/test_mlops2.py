"""Batch 86: naive Bayes + Viterbi decode."""

import glob
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _docs():
    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    return pd.concat(
        pd.read_parquet(f, columns=["doc_id", "text", "lang"]) for f in files
    )


def _hex32(s):
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_naive_bayes_matches_python_mirror(spark):
    from ocr_to_csv_spark.functions.mlops2 import NB_ROUND, q_naive_bayes

    d = _docs()
    d["h"] = d.doc_id.map(lambda x: _hex32(str(x)) % 2)
    train, test = d[d.h == 0], d[d.h == 1]
    counts = {}
    totals = {}
    priors = {}
    vocab = set()
    for _, r in train.iterrows():
        priors[r.lang] = priors.get(r.lang, 0) + 1
        for t in r.text.split():
            counts[(r.lang, t)] = counts.get((r.lang, t), 0) + 1
            totals[r.lang] = totals.get(r.lang, 0) + 1
            vocab.add(t)
    v = len(vocab)
    n_train = len(train)
    want = {}
    for _, r in test.iterrows():
        best = None
        for cls in sorted(priors):
            contribs = sorted(
                round(
                    math.log(
                        (counts.get((cls, t), 0) + 1) / (totals[cls] + v)
                    ),
                    NB_ROUND,
                )
                for t in r.text.split()
            )
            ll = 0.0
            for c in contribs:
                ll += c
            score = round(
                round(math.log(priors[cls] / n_train), NB_ROUND) + ll, 6
            )
            if best is None or score > best[1]:
                best = (cls, score)
        want[r.doc_id] = best
    got = {
        r.doc_id: (r.pred_lang, r.score)
        for r in q_naive_bayes(spark, SF).collect()
    }
    assert got == want
    # the sf corpus draws every lang from ONE shared wordlist, so lang
    # is not learnable — assert structure, not accuracy (the planted
    # disjoint-vocab test below proves the classifier math)
    classes = set(train.lang)
    assert set(got) == set(test.doc_id)
    for cls, score in got.values():
        assert cls in classes
        assert score < 0.0


def test_naive_bayes_separates_disjoint_vocab(spark, tmp_path):
    """On a planted corpus whose classes use disjoint vocabulary the
    held-out predictions must be perfect."""
    import pandas as pd

    from ocr_to_csv_spark.functions.mlops2 import q_naive_bayes

    words = {"aa": "red green blue", "bb": "hot cold warm"}
    rows = []
    for i in range(40):
        lang = "aa" if i % 2 == 0 else "bb"
        rows.append(
            {
                "doc_id": f"d{i}",
                "text": (words[lang] + " ") * 3,
                "lang": lang,
                "source": "s",
                "n_chars": 10,
            }
        )
    sf = str(tmp_path)
    pd.DataFrame(rows).to_parquet(f"{sf}/documents.parquet", index=False)
    got = q_naive_bayes(spark, sf).collect()
    assert got, "hash split must put docs in both halves"
    for r in got:
        assert r.pred_lang == r.true_lang


def test_viterbi_matches_python_mirror(spark):
    from ocr_to_csv_spark.functions.mlops2 import (
        E_I,
        E_UNK,
        PI_I,
        T_I,
        q_viterbi_path,
    )

    files = sorted(glob.glob(f"{SF}/events.parquet")) or sorted(
        glob.glob(f"{SF}/events.parquet/*.parquet")
    )
    e = pd.concat(
        pd.read_parquet(f, columns=["user_id", "ts", "event_id", "event_type"])
        for f in files
    )
    got = {r.user_id: r for r in q_viterbi_path(spark, SF).collect()}
    for uid, grp in e.groupby("user_id"):
        obs = list(
            grp.sort_values(["ts", "event_id", "event_type"]).event_type
        )
        s0_score, s0_path = None, None
        states = [
            (PI_I[s] + E_I.get(obs[0], E_UNK)[s], [s]) for s in (0, 1)
        ]
        for o in obs[1:]:
            new = []
            for s in (0, 1):
                c0 = states[0][0] + T_I[0][s]
                c1 = states[1][0] + T_I[1][s]
                if c1 > c0:
                    best, path = c1, states[1][1]
                else:
                    best, path = c0, states[0][1]
                new.append((best + E_I.get(o, E_UNK)[s], path + [s]))
            states = new
        # final pick: strict > prefers state 1 only when greater
        if states[1][0] > states[0][0]:
            score, path = states[1]
        else:
            score, path = states[0]
        r = got[uid]
        assert r.best_score == score, uid
        assert r.path == ",".join(map(str, path)), uid
        assert r.n_events == len(obs)


def test_viterbi_textbook_decodes():
    """Pure-model sanity: a purchase run decodes engaged; a view run
    decodes casual."""
    from ocr_to_csv_spark.functions.mlops2 import E_I, E_UNK, PI_I, T_I

    def decode(obs):
        states = [
            (PI_I[s] + E_I.get(obs[0], E_UNK)[s], [s]) for s in (0, 1)
        ]
        for o in obs[1:]:
            new = []
            for s in (0, 1):
                c0 = states[0][0] + T_I[0][s]
                c1 = states[1][0] + T_I[1][s]
                best, path = (
                    (c1, states[1][1]) if c1 > c0 else (c0, states[0][1])
                )
                new.append((best + E_I.get(o, E_UNK)[s], path + [s]))
            states = new
        return (
            states[1][1] if states[1][0] > states[0][0] else states[0][1]
        )

    assert decode(["purchase"] * 4) == [1, 1, 1, 1]
    assert decode(["view"] * 4) == [0, 0, 0, 0]
    mixed = decode(["view", "view", "purchase", "purchase", "view"])
    assert mixed[0] == 0 and 1 in mixed
