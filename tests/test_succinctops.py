"""Batch 159: rank/select directory + FM count — python mirrors, and
the structures' own self-verification flags pinned all-ok (rank/select
answers equal the direct row-level computation; FM backward search
equals the substring count)."""

import glob
import hashlib

import pandas as pd

SF = "/root/testdata/sf0.001"


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_rank_select_matches_python(spark):
    from ocr_to_csv_spark.functions.succinctops import (
        N_PROBES, q_rank_select,
    )

    files = sorted(glob.glob(f"{SF}/orders.parquet")) or sorted(
        glob.glob(f"{SF}/orders.parquet/*.parquet")
    )
    o = pd.concat(
        pd.read_parquet(f, columns=["o_orderkey", "o_orderpriority"])
        for f in files
    ).sort_values("o_orderkey")
    bits = [int(p == "1-URGENT") for p in o.o_orderpriority]
    n = len(bits)
    ones = sum(bits)
    pref = [0]
    for b in bits:
        pref.append(pref[-1] + b)
    one_pos = [i + 1 for i, b in enumerate(bits) if b]
    exp = {}
    for k in range(N_PROBES):
        p = _h32(f"rs|{k}") % n + 1
        exp[("rank", p)] = pref[p]
        q = _h32(f"ss|{k}") % ones + 1
        exp[("select", q)] = one_pos[q - 1]
    got = {
        (r.kind, r.probe): (r.answer, r.direct, r.ok)
        for r in q_rank_select(spark, SF).collect()
    }
    assert set(got) == set(exp)
    for key, want in exp.items():
        ans, direct, ok = got[key]
        assert ans == want and direct == want and ok == 1, key


def test_fm_count_matches_python(spark):
    from ocr_to_csv_spark.functions.succinctops import (
        FM_PAT, SENT, q_fm_count,
    )
    from ocr_to_csv_spark.functions.bwtops import BWT_LEN, PROBE_MOD

    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    docs = pd.concat(
        pd.read_parquet(f, columns=["doc_id", "text"]) for f in files
    )
    exp = {}
    for r in docs.itertuples(index=False):
        if r.doc_id % PROBE_MOD:
            continue
        s = str(r.text)[:BWT_LEN]
        t = s + SENT
        rots = sorted(t[i:] + t[:i] for i in range(len(t)))
        bwt = "".join(rr[-1] for rr in rots)
        lo, hi = 0, len(bwt)
        for ch in reversed(FM_PAT):
            sm = sum(1 for x in bwt if x < ch)
            lo = sm + bwt[:lo].count(ch)
            hi = sm + bwt[:hi].count(ch)
        fm = max(hi - lo, 0)
        direct = s.count(FM_PAT)
        exp[int(r.doc_id)] = (len(s), fm, direct)
    got = {
        r.doc_id: (r.n, r.fm_count, r.direct_count, r.ok)
        for r in q_fm_count(spark, SF).collect()
    }
    assert set(got) == set(exp)
    for did, (n, fm, direct) in exp.items():
        gn, gfm, gdirect, ok = got[did]
        assert (gn, gfm, gdirect) == (n, fm, direct), did
        assert ok == 1 and fm == direct, did
    # FM actually counted overlapping-free occurrences correctly: at
    # least one probe doc contains the pattern at these corpora
    assert any(v[1] > 0 for v in exp.values())
