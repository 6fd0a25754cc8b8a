"""Batch 153: XOR peeling + Bloom FPR audit — python mirrors of the
peeling rounds and the bit-exact filter, plus the construction pins
(full peel succeeds at c=1.23; measured FPR within a factor of the
theoretical rate; no false negatives by construction)."""

import glob
import hashlib
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _keys():
    files = sorted(glob.glob(f"{SF}/customer.parquet")) or sorted(
        glob.glob(f"{SF}/customer.parquet/*.parquet")
    )
    return sorted(
        int(k)
        for k in pd.concat(
            pd.read_parquet(f, columns=["c_custkey"]) for f in files
        ).c_custkey
    )


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_xor_peel_matches_python_and_succeeds(spark):
    from ocr_to_csv_spark.functions.filterops import (
        PEEL_C_MILLI, PEEL_ROUNDS, q_xor_peel,
    )

    keys = _keys()
    n = len(keys)
    m = (n * PEEL_C_MILLI) // 1000 + 1
    live = set(keys)
    for _ in range(PEEL_ROUNDS):
        deg = {}
        inc = {}
        for k in live:
            for h in range(3):
                c = _h32(f"xp{h}|{k}") % m
                deg[c] = deg.get(c, 0) + 1
                inc.setdefault(c, set()).add(k)
        peeled = set()
        for c, d in deg.items():
            if d == 1:
                peeled |= inc[c]
        live -= peeled
    r = q_xor_peel(spark, SF).collect()[0]
    assert (r.n_keys, r.m_cells, r.n_peeled, r.success) == (
        n, m, n - len(live), int(not live),
    )
    # the xor-filter feasibility condition at the slack capacity
    assert r.success == 1


def test_bloom_fpr_matches_python(spark):
    from ocr_to_csv_spark.functions.filterops import (
        BLOOM_K, BLOOM_M, q_bloom_fpr_audit,
    )

    keys = _keys()
    build = [k for k in keys if k % 2 == 0]
    probe = [k for k in keys if k % 2 == 1]
    bits = set()
    for k in build:
        for h in range(BLOOM_K):
            bits.add(_h32(f"bf{h}|{k}") % BLOOM_M)
    n_fp = sum(
        1
        for k in probe
        if all(
            (_h32(f"bf{h}|{k}") % BLOOM_M) in bits for h in range(BLOOM_K)
        )
    )
    theory = math.floor(
        (1 - (1 - 1 / BLOOM_M) ** (BLOOM_K * len(build))) ** BLOOM_K * 1000
    )
    r = q_bloom_fpr_audit(spark, SF).collect()[0]
    assert (r.n_build, r.n_probe, r.n_fp) == (len(build), len(probe), n_fp)
    assert r.fp_milli == 1000 * n_fp // len(probe)
    assert r.theory_milli == theory
    # no false negatives by construction: every build key passes
    for k in build[:50]:
        assert all(
            (_h32(f"bf{h}|{k}") % BLOOM_M) in bits for h in range(BLOOM_K)
        )
    # measured FPR in the same regime as theory (loose: within 4x + slack)
    assert r.fp_milli <= 4 * max(r.theory_milli, 1) + 50
