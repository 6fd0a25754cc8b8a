"""Batch 166: quorum + chain replication — python mirrors and the
protocol pins (R+W>N reads are never stale on ANY key; R+W<=N reads
ARE stale somewhere; the chain tail is the committed minimum)."""

import glob
import hashlib

import pandas as pd

SF = "/root/testdata/sf0.001"


def _h(tag):
    return int(hashlib.md5(tag.encode()).hexdigest()[:8], 16)


def _latest():
    from ocr_to_csv_spark.functions.quorumops import Q_KEYS

    files = sorted(glob.glob(f"{SF}/orders.parquet")) or sorted(
        glob.glob(f"{SF}/orders.parquet/*.parquet")
    )
    o = pd.concat(pd.read_parquet(f, columns=["o_orderkey"]) for f in files)
    out = {}
    for k in o.o_orderkey:
        key = int(k) % Q_KEYS
        out[key] = max(out.get(key, 0), int(k))
    return out


def test_quorum_rw_matches_python(spark):
    from ocr_to_csv_spark.functions.quorumops import (
        N_REP, Q_KEYS, R_SAFE, R_UNSAFE, W_Q, q_quorum_rw,
    )

    latest = _latest()
    exp = {}
    for kk in sorted(latest):
        wr = sorted(range(N_REP), key=lambda r: (_h(f"qw|{kk}|{r}"), r))
        rd = sorted(range(N_REP), key=lambda r: (_h(f"qr|{kk}|{r}"), r))
        ws = set(wr[:W_Q])
        v = {
            r: (0 if r in ws else _h(f"ql|{kk}|{r}") % 50 + 1)
            for r in range(N_REP)
        }
        safe = min(v[r] for r in rd[:R_SAFE])
        unsafe = min(v[r] for r in rd[:R_UNSAFE])
        exp[kk] = (
            latest[kk], latest[kk] - safe, latest[kk] - unsafe,
            int(safe == 0), int(unsafe > 0),
        )
    got = {
        r.key: (r.latest, r.read_safe, r.read_unsafe, r.safe_ok,
                r.unsafe_stale)
        for r in q_quorum_rw(spark, SF).collect()
    }
    assert got == exp
    # quorum intersection: R+W>N never stale; R+W<=N stale somewhere
    assert all(v[3] == 1 for v in got.values())
    assert any(v[4] == 1 for v in got.values())


def test_chain_replication_matches_python(spark):
    from ocr_to_csv_spark.functions.quorumops import (
        N_REP, q_chain_replication,
    )

    latest = _latest()
    exp = {}
    for kk in sorted(latest):
        cum = 0
        lags = []
        for i in range(N_REP):
            cum += _h(f"cl|{kk}|{i}") % 20
            lags.append(cum)
        exp[kk] = (
            latest[kk] - lags[0], latest[kk] - lags[-1],
            lags[-1] - lags[0], int(lags[-1] == max(lags)),
        )
    got = {
        r.key: (r.head_v, r.tail_v, r.window, r.tail_is_min)
        for r in q_chain_replication(spark, SF).collect()
    }
    assert got == exp
    # the tail never leads: committed reads at the tail, every key
    assert all(v[3] == 1 for v in got.values())
    assert all(v[2] >= 0 for v in got.values())
