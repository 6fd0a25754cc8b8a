"""Batch 167: Z-array + Z-based counting — python mirrors (direct
LCP definition) and the two-mechanism agreement pin (Z occurrences ==
substring count on every probe doc)."""

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


def _z(s):
    n = len(s)
    z = [n]
    for i in range(1, n):
        k = 0
        while i + k < n and s[k] == s[i + k]:
            k += 1
        z.append(k)
    return z


def test_z_array_matches_python(spark):
    from ocr_to_csv_spark.functions.zarrops import q_z_array

    exp = {}
    for did, s in _probe().items():
        z = _z(s)[1:]
        exp[did] = (len(s), max(z) if z else 0,
                    sum(1 for x in z if x >= 4))
    got = {
        r.doc_id: (r.n, r.max_z, r.n_z_ge4)
        for r in q_z_array(spark, SF).collect()
    }
    assert got == exp


def test_z_count_matches_python_and_agrees(spark):
    from ocr_to_csv_spark.functions.zarrops import SENT2, Z_PAT, q_z_count

    exp = {}
    for did, s in _probe().items():
        cat = Z_PAT + SENT2 + s
        z = _z(cat)
        zc = sum(1 for x in z[len(Z_PAT) + 1 :] if x >= len(Z_PAT))
        exp[did] = (len(s), zc, s.count(Z_PAT))
    got = {
        r.doc_id: (r.n, r.z_count, r.direct_count, r.ok)
        for r in q_z_count(spark, SF).collect()
    }
    assert set(got) == set(exp)
    for did, (n, zc, direct) in exp.items():
        gn, gzc, gd, ok = got[did]
        assert (gn, gzc, gd) == (n, zc, direct), did
        assert ok == 1 and zc == direct, did
