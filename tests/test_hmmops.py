"""Batch 141: HMM forward + forward-backward posterior — python
mirrors of the scaled recursions, plus the sum-product vs max-product
pin (forward log-likelihood >= Viterbi best-path log-likelihood, since
the forward sum includes the best path)."""

import glob
import math

import pandas as pd

SF = "/root/testdata/sf0.001"
NANO = 1_000_000_000


def _seqs():
    files = sorted(glob.glob(f"{SF}/events.parquet")) or sorted(
        glob.glob(f"{SF}/events.parquet/*.parquet")
    )
    ev = pd.concat(
        pd.read_parquet(f, columns=["user_id", "ts", "event_id", "event_type"])
        for f in files
    )
    out = {}
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id", "event_type"])
        out[int(uid)] = list(g.event_type)
    return out


def _eprob(o):
    from ocr_to_csv_spark.functions.hmmops import P_UNK
    from ocr_to_csv_spark.functions.mlops2 import _E

    return _E.get(o, [P_UNK, P_UNK])


def test_hmm_forward_matches_python(spark):
    from ocr_to_csv_spark.functions.hmmops import q_hmm_forward
    from ocr_to_csv_spark.functions.mlops2 import _PI, _T

    exp = {}
    for uid, obs in _seqs().items():
        e = _eprob(obs[0])
        a0, a1 = _PI[0] * e[0], _PI[1] * e[1]
        c = a0 + a1
        a0, a1 = a0 / c, a1 / c
        ll = round(math.log(c) * NANO)
        for o in obs[1:]:
            e = _eprob(o)
            r0 = (a0 * _T[0][0] + a1 * _T[1][0]) * e[0]
            r1 = (a0 * _T[0][1] + a1 * _T[1][1]) * e[1]
            c = r0 + r1
            a0, a1 = r0 / c, r1 / c
            ll += round(math.log(c) * NANO)
        exp[uid] = (len(obs), int(ll), round(a1, 9))
    got = {
        r.user_id: (r.n_events, r.ll_nano, r.a1_final)
        for r in q_hmm_forward(spark, SF).collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert abs(got[k][1] - exp[k][1]) <= 1  # one ulp of nano-rounding
        assert abs(got[k][2] - exp[k][2]) < 2e-9


def test_hmm_posterior_matches_python_and_forward_bounds_viterbi(spark):
    from ocr_to_csv_spark.functions.hmmops import q_hmm_forward, q_hmm_posterior
    from ocr_to_csv_spark.functions.mlops2 import _PI, _T, q_viterbi_path

    exp = {}
    for uid, obs in _seqs().items():
        n = len(obs)
        es = [_eprob(o) for o in obs]
        al = []
        a0, a1 = _PI[0] * es[0][0], _PI[1] * es[0][1]
        c = a0 + a1
        al.append((a0 / c, a1 / c))
        for e in es[1:]:
            a0, a1 = al[-1]
            r0 = (a0 * _T[0][0] + a1 * _T[1][0]) * e[0]
            r1 = (a0 * _T[0][1] + a1 * _T[1][1]) * e[1]
            c = r0 + r1
            al.append((r0 / c, r1 / c))
        be = [(1.0, 1.0)]
        for e in reversed(es[1:]):
            b0, b1 = be[-1]
            r0 = _T[0][0] * e[0] * b0 + _T[0][1] * e[1] * b1
            r1 = _T[1][0] * e[0] * b0 + _T[1][1] * e[1] * b1
            c = r0 + r1
            be.append((r0 / c, r1 / c))
        be = list(reversed(be))
        hits = sum(
            1
            for t in range(n)
            if al[t][1] * be[t][1] > al[t][0] * be[t][0]
        )
        exp[uid] = (n, hits)
    got = {
        r.user_id: (r.n_events, r.n_smooth1)
        for r in q_hmm_posterior(spark, SF).collect()
    }
    assert got == exp
    # sum-product >= max-product: forward ll >= viterbi best score
    # (viterbi scores are milli-nat ints at MILLI=1e6; ll_nano at 1e9)
    vit = {
        r.user_id: r.best_score for r in q_viterbi_path(spark, SF).collect()
    }
    fwd = {r.user_id: r.ll_nano for r in q_hmm_forward(spark, SF).collect()}
    slack = 10**6  # nano-units of rounding slack across the two scales
    for uid, ll in fwd.items():
        assert ll + slack >= vit[uid] * 1000
