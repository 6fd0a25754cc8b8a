"""Batch 133: suffix-array prefix doubling + longest repeated phrase —
full python mirrors (direct capped-suffix sort vs the doubling rounds)
and the repeated-phrase guarantee (the winning phrase really occurs at
two distinct positions in the corpus)."""

import glob

import pandas as pd

SF = "/root/testdata/sf0.001"


def _docs():
    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    return pd.concat(
        pd.read_parquet(f, columns=["doc_id", "text"]) for f in files
    )


def _suffixes():
    """[(key16_tuple, doc_id, off 1-based, toks)] for every position."""
    out = []
    toks_by_doc = {}
    for r in _docs().itertuples(index=False):
        toks = [t for t in str(r.text).split() if t]
        toks_by_doc[r.doc_id] = toks
        for i in range(len(toks)):
            out.append((tuple(toks[i : i + 16]), r.doc_id, i + 1))
    out.sort()
    return out, toks_by_doc


def test_suffix_rank_matches_python(spark):
    from ocr_to_csv_spark.functions.suffixops import SA_TOP, q_suffix_rank

    sfx, toks_by_doc = _suffixes()
    got = q_suffix_rank(spark, SF).collect()
    assert len(got) == SA_TOP
    for r, (key, did, off) in zip(got, sfx[:SA_TOP]):
        assert (r.doc_id, r.off) == (did, off)
        assert r.head == " ".join(toks_by_doc[did][off - 1 : off + 2])
    assert [r.sa_idx for r in got] == list(range(1, SA_TOP + 1))


def test_longest_repeat_matches_python(spark):
    from ocr_to_csv_spark.functions.suffixops import q_longest_repeat

    sfx, toks_by_doc = _suffixes()
    best = []
    n_at_max = 0
    mx = -1
    for (k1, d1, o1), (k2, d2, o2) in zip(sfx, sfx[1:]):
        lcp = 0
        for a, b in zip(k1, k2):
            if a != b:
                break
            lcp += 1
        if lcp > mx:
            mx, n_at_max, best = lcp, 1, [(d2, o2)]
        elif lcp == mx:
            n_at_max += 1
            best.append((d2, o2))
    # spark keeps the min (doc_id, off) of the RIGHT member of each
    # adjacent pair? no — of the pair rows themselves, which carry the
    # right suffix's (doc_id, off); mirror that.
    did, off = min(best)
    r = q_longest_repeat(spark, SF).collect()[0]
    assert (r.max_lcp, r.doc_id, r.off, r.n_at_max) == (mx, did, off, n_at_max)
    phrase = " ".join(toks_by_doc[did][off - 1 : off - 1 + mx])
    assert r.phrase == phrase
    if mx > 0:
        # the phrase genuinely repeats: >= 2 distinct corpus positions
        n_occ = 0
        for toks in toks_by_doc.values():
            for i in range(len(toks) - mx + 1):
                if toks[i : i + mx] == phrase.split():
                    n_occ += 1
        assert n_occ >= 2
