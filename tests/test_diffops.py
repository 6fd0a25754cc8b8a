"""Batch 131: Merkle bucket diff + COEC bias — python mirrors and the
change-detection semantics (every mutated/deleted key's bucket is
flagged; untouched buckets are absent; COEC weighted mean ≈ 1)."""

import glob
import hashlib
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

SF = "/root/testdata/sf0.001"


def _tab(name, cols):
    files = sorted(glob.glob(f"{SF}/{name}.parquet")) or sorted(
        glob.glob(f"{SF}/{name}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _rhu(v):
    return int(Decimal(repr(float(v))).quantize(Decimal(1), ROUND_HALF_UP))


def test_merkle_diff_matches_python(spark):
    from ocr_to_csv_spark.functions.diffops import (
        MD_BUCKETS,
        MD_DEL,
        MD_MUT,
        q_merkle_diff,
    )

    o = _tab("orders", ["o_orderkey", "o_totalprice"])
    v1, v2 = {}, {}
    for r in o.itertuples(index=False):
        k = int(r.o_orderkey)
        c = _rhu(r.o_totalprice * 100)
        v1[k] = c
        if k % MD_DEL != 0:
            v2[k] = c + 1 if k % MD_MUT == 0 else c
    def digests(v):
        d = {}
        for k, val in v.items():
            b = k % MD_BUCKETS
            d[b] = d.get(b, 0) + _h32(f"{k}|{val}")
        return d
    d1, d2 = digests(v1), digests(v2)
    bad = {
        b for b in set(d1) | set(d2)
        if d1.get(b, -1) != d2.get(b, -1)
    }
    gold = {}
    for b in bad:
        chg = sum(
            1 for k in v1
            if k % MD_BUCKETS == b and k in v2 and v1[k] != v2[k]
        )
        dele = sum(
            1 for k in v1 if k % MD_BUCKETS == b and k not in v2
        )
        gold[b] = (d1.get(b, 0), d2.get(b, 0), chg, dele)
    got = {
        r.bucket: (r.v1_digest, r.v2_digest, r.n_changed, r.n_deleted)
        for r in q_merkle_diff(spark, SF).collect()
    }
    assert got == gold
    # every mutated or deleted key's bucket is flagged
    for k in v1:
        if k % MD_DEL == 0 or k % MD_MUT == 0:
            assert k % MD_BUCKETS in got
    # flagged buckets really changed
    for b, (_, _, chg, dele) in got.items():
        assert chg + dele > 0


def test_coec_bias_matches_python(spark):
    from ocr_to_csv_spark.functions.diffops import (
        COEC_POS,
        COEC_THRESH,
        q_coec_bias,
    )

    e = _tab("events", ["event_type", "event_id", "value"])
    prior_c, prior_n = {}, {}
    per = {}
    for r in e.itertuples(index=False):
        pos = int(r.event_id) % COEC_POS + 1
        click = 1 if float(r.value) >= COEC_THRESH else 0
        prior_c[pos] = prior_c.get(pos, 0) + click
        prior_n[pos] = prior_n.get(pos, 0) + 1
        key = (r.event_type, pos)
        c, n = per.get(key, (0, 0))
        per[key] = (c + click, n + 1)
    prior = {
        p: prior_c[p] * 1_000_000 // prior_n[p] for p in prior_n
    }
    gold = {}
    for (typ, pos), (c, n) in per.items():
        obs, exp = gold.get(typ, (0, 0))
        gold[typ] = (obs + c, exp + n * prior[pos])
    got = {
        r.typ: (r.observed, r.expected_micro, r.coec_milli)
        for r in q_coec_bias(spark, SF).collect()
    }
    assert got == {
        t: (o, x, o * 1_000_000_000 // x) for t, (o, x) in gold.items()
    }
    # expected-weighted mean COEC sits near 1 (the priors were fit on
    # the same log): aggregate observed ≈ aggregate expected
    tot_o = sum(v[0] for v in got.values())
    tot_x = sum(v[1] for v in got.values())
    assert abs(tot_o * 1_000_000 / tot_x - 1.0) < 0.01
