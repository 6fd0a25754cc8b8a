"""Batch 139: RAKE keyphrases + Dirichlet QL retrieval — python
mirrors of the phrase segmentation / degree-freq scoring and the
smoothed language-model ranking; definitional pins (phrases contain no
stopwords; QL prefers docs dense in the query terms)."""

import glob
import math
from collections import Counter, defaultdict

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


def _phrases():
    from ocr_to_csv_spark.functions.rakeops import RAKE_MAX_WORDS, STOPWORDS

    out = []
    for r in _docs().itertuples(index=False):
        toks = [t for t in str(r.text).lower().split() if t]
        cur = []
        for t in toks + ["§"]:
            if t in STOPWORDS or t == "§":
                if cur and len(cur) <= RAKE_MAX_WORDS:
                    out.append(" ".join(cur))
                cur = []
            else:
                cur.append(t)
    return out


def test_rake_matches_python(spark):
    from ocr_to_csv_spark.functions.rakeops import (
        RAKE_TOP, STOPWORDS, q_rake_keywords,
    )

    phrases = _phrases()
    freq, deg = Counter(), Counter()
    for p in phrases:
        ws = p.split(" ")
        for w in ws:
            freq[w] += 1
            deg[w] += len(ws)
    wnano = {w: (deg[w] * NANO) // freq[w] for w in freq}
    score = {}
    occ = Counter(phrases)
    for p in set(phrases):
        score[p] = sum(wnano[w] for w in p.split(" "))
    exp = sorted(
        ((p, len(p.split(" ")), occ[p], score[p]) for p in score),
        key=lambda t: (-t[3], t[0]),
    )[:RAKE_TOP]
    got = [
        (r.phrase, r.n_words, r.n_occur, r.score_nano)
        for r in q_rake_keywords(spark, SF).collect()
    ]
    assert got == exp
    for p, _, _, _ in got:
        assert not any(w in STOPWORDS for w in p.split(" "))


def test_ql_dirichlet_matches_python(spark):
    from ocr_to_csv_spark.functions.rakeops import QL_MU, q_ql_dirichlet
    from ocr_to_csv_spark.functions.textops import TFIDF_TERMS

    docs = {
        r.doc_id: [t for t in str(r.text).split() if t]
        for r in _docs().itertuples(index=False)
    }
    clen = sum(len(t) for t in docs.values())
    cf = {
        t: sum(tk.count(t) for tk in docs.values()) for t in TFIDF_TERMS
    }
    scores = {}
    for did, tk in docs.items():
        s = 0
        for t in TFIDF_TERMS:
            num = tk.count(t) * clen + QL_MU * cf[t]
            den = clen * (len(tk) + QL_MU)
            s += round(math.log(num / den) * NANO)
        scores[did] = s
    exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r.doc_id, r.ql_nano) for r in q_ql_dirichlet(spark, SF).collect()]
    assert got == exp
    # ranking sanity: the winner has at least one query term
    top_doc = got[0][0]
    assert any(t in docs[top_doc] for t in TFIDF_TERMS)
