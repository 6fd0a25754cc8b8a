"""Batch 142: DGIM + Misra-Gries — python mirrors of both folds, the
DGIM error bound (|est − actual| ≤ max_size/2 = 2 with the level cap),
and the MG guarantee (any element with frequency > n/(k+1) survives)."""

import glob

import pandas as pd

SF = "/root/testdata/sf0.001"


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


def test_dgim_matches_python_and_error_bound(spark):
    from ocr_to_csv_spark.functions.streamsketch import (
        DGIM_LEVELS, DGIM_W, q_dgim_count,
    )

    exp = {}
    for uid, obs in _seqs().items():
        bits = [1 if o == "purchase" else 0 for o in obs]
        buckets = []  # (size, pos) newest first
        for i, b in enumerate(bits, 1):
            buckets = [(s, p) for s, p in buckets if p > i - DGIM_W]
            if b:
                buckets = [(1, i)] + buckets
                for sv in DGIM_LEVELS:
                    same = [x for x in buckets if x[0] == sv]
                    if len(same) >= 3:
                        a = [x for x in buckets if x[0] < sv]
                        c = [x for x in buckets if x[0] > sv]
                        merged = (2 * sv, same[-2][1])
                        buckets = a + same[:-2] + [merged] + c
        tot = sum(s for s, _ in buckets)
        est = tot - buckets[-1][0] // 2 if buckets else 0
        actual = sum(bits[max(len(bits) - DGIM_W, 0):])
        exp[uid] = (len(obs), len(buckets), est, actual)
    got = {
        r.user_id: (r.n_events, r.n_buckets, r.est, r.actual)
        for r in q_dgim_count(spark, SF).collect()
    }
    assert got == exp
    for _, _, est, actual in got.values():
        assert abs(est - actual) <= 2  # capped-level DGIM bound
    assert any(v[2] > 0 for v in got.values())


def test_space_saving_matches_python_and_guarantee(spark):
    from ocr_to_csv_spark.functions.streamsketch import (
        MG_K, TYPE_CODES, q_space_saving,
    )

    exp = {}
    seqs = _seqs()
    for uid, obs in seqs.items():
        codes = [TYPE_CODES.get(o, 9) for o in obs]
        counters = {}  # code -> count
        for c in codes:
            if c in counters:
                counters[c] += 1
            elif len(counters) < MG_K:
                counters[c] = 1
            else:
                counters = {
                    k: v - 1 for k, v in counters.items() if v - 1 > 0
                }
        rendered = ",".join(
            f"{c}:{counters[c]}" for c in sorted(counters)
        )
        exp[uid] = (len(obs), len(counters), rendered)
    got = {
        r.user_id: (r.n_events, r.n_counters, r.counters)
        for r in q_space_saving(spark, SF).collect()
    }
    assert got == exp
    # MG guarantee: freq > n/(k+1) ⇒ the element survives in the sketch
    for uid, obs in seqs.items():
        n = len(obs)
        codes = [TYPE_CODES.get(o, 9) for o in obs]
        surviving = {
            int(p.split(":")[0]) for p in got[uid][2].split(",") if p
        }
        for c in set(codes):
            if codes.count(c) * (MG_K + 1) > n:
                assert c in surviving, (uid, c)
