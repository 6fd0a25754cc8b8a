"""Batch 143: BWT+RLE and MTF — python mirrors (rotation sort, run
counting, move-to-front fold) plus the bzip2-effect pins: BWT clusters
runs and concentrates MTF mass on small codes on average."""

import glob

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


def _bwt(s):
    rots = sorted(s[i:] + s[:i] for i in range(len(s)))
    return "".join(r[-1] for r in rots)


def _runs(s):
    if len(s) < 2:
        return len(s)
    return 1 + sum(1 for a, b in zip(s, s[1:]) if a != b)


def _mtf(s):
    alph = sorted(set(s))
    cost = small = 0
    for ch in s:
        j = alph.index(ch) + 1
        cost += j - 1
        small += 1 if j <= 2 else 0
        alph.remove(ch)
        alph.insert(0, ch)
    return cost, small


def test_bwt_rle_matches_python(spark):
    from ocr_to_csv_spark.functions.bwtops import q_bwt_rle

    probe = _probe()
    exp = {
        did: (len(s), _runs(s), _runs(_bwt(s)), _bwt(s)[:16])
        for did, s in probe.items()
    }
    got = {
        r.doc_id: (r.n, r.runs_orig, r.runs_bwt, r.bwt_head)
        for r in q_bwt_rle(spark, SF).collect()
    }
    assert got == exp
    # the clustering effect: BWT does not increase total runs on average
    assert sum(v[2] for v in got.values()) <= sum(v[1] for v in got.values())


def test_mtf_matches_python(spark):
    from ocr_to_csv_spark.functions.bwtops import q_mtf_encode

    probe = _probe()
    exp = {}
    for did, s in probe.items():
        cr, sr = _mtf(s)
        cb, sb = _mtf(_bwt(s))
        exp[did] = (len(s), cr, sr, cb, sb)
    got = {
        r.doc_id: (r.n, r.cost_raw, r.small_raw, r.cost_bwt, r.small_bwt)
        for r in q_mtf_encode(spark, SF).collect()
    }
    assert got == exp
    # bzip2 effect: BWT-then-MTF yields at least as many small codes
    assert sum(v[4] for v in got.values()) >= sum(v[2] for v in got.values())
