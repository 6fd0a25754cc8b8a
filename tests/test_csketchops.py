"""Batch 170: Count-Sketch + universal-hash audit — python mirrors,
the unbiasedness-in-practice pin (heavy probes land within a noise
band of the truth) and the universality band pin."""

import glob
import hashlib
from collections import Counter

import pandas as pd

SF = "/root/testdata/sf0.001"


def _h(tag):
    return int(hashlib.md5(tag.encode()).hexdigest()[:8], 16)


def _toks():
    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    docs = pd.concat(
        pd.read_parquet(f, columns=["text"]) for f in files
    )
    out = []
    for t in docs.text:
        out.extend(x for x in str(t).lower().split() if x)
    return out


def test_count_sketch_matches_python(spark):
    from ocr_to_csv_spark.functions.csketchops import (
        CS_J, CS_PROBES, CS_W, q_count_sketch,
    )

    toks = _toks()
    cells = {}
    for t in toks:
        for j in range(CS_J):
            b = _h(f"csb{j}|{t}") % CS_W
            sg = (_h(f"css{j}|{t}") % 2) * 2 - 1
            cells[(j, b)] = cells.get((j, b), 0) + sg
    exact = Counter(toks)
    exp = {}
    for term in CS_PROBES:
        reads = sorted(
            ((_h(f"css{j}|{term}") % 2) * 2 - 1)
            * cells.get((j, _h(f"csb{j}|{term}") % CS_W), 0)
            for j in range(CS_J)
        )
        est = reads[CS_J // 2]
        exp[term] = (exact.get(term, 0), est, abs(exact.get(term, 0) - est))
    got = {
        r.term: (r.exact, r.est, r.abs_err)
        for r in q_count_sketch(spark, SF).collect()
    }
    assert got == exp
    # heavy terms estimated within a noise band; every heavy probe > 0
    for term in ("join", "hash", "row", "batch", "scan"):
        ex, est, err = got[term]
        assert ex > 0
        assert err <= max(50, ex)  # W=256 noise band at this corpus


def test_hash_family_audit_matches_python(spark):
    from ocr_to_csv_spark.functions.csketchops import (
        HF_AB, HF_M, HF_P, q_hash_family_audit,
    )

    files = sorted(glob.glob(f"{SF}/customer.parquet")) or sorted(
        glob.glob(f"{SF}/customer.parquet/*.parquet")
    )
    keys = [
        int(k)
        for k in pd.concat(
            pd.read_parquet(f, columns=["c_custkey"]) for f in files
        ).c_custkey
    ]
    n = len(keys)
    exp = {}
    for k, (a, b) in enumerate(HF_AB):
        loads = Counter(((x * a + b) % HF_P) % HF_M for x in keys)
        coll = sum(c * (c - 1) // 2 for c in loads.values())
        exp[k] = (n, HF_M, coll, (2000 * coll * HF_M) // (n * (n - 1)))
    got = {
        r.fn_id: (r.n, r.m, r.coll_pairs, r.ratio_milli)
        for r in q_hash_family_audit(spark, SF).collect()
    }
    assert got == exp
    # universality: mean ratio across the family near 1000
    ratios = [v[3] for v in got.values()]
    mean = sum(ratios) / len(ratios)
    assert 700 <= mean <= 1300
