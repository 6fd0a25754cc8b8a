"""Batch 161: UCB1 + ETC bandits — python mirrors replaying the exact
md5 reward streams and nano-quantized score comparisons, plus the
policy pins (both concentrate pulls on the truly-best arm and clear
the worst-arm baseline)."""

import glob
import hashlib
import math

import pandas as pd

SF = "/root/testdata/sf0.001"
NANO = 1_000_000_000


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _reward(a, t):
    from ocr_to_csv_spark.functions.banditops import ARMS

    return 1 if _h32(f"bd|{a}|{t}") % 1000 < ARMS[a] else 0


def _replay(ucb):
    from ocr_to_csv_spark.functions.banditops import (
        ARMS, ETC_M, T_STEPS,
    )

    k = len(ARMS)
    n = [0] * k
    s = [0] * k
    for t in range(1, T_STEPS + 1):
        if ucb:
            if t <= k:
                arm = t - 1
            else:
                keys = []
                for a in range(k):
                    na = max(n[a], 1)
                    tt = max(t - 1, 1)
                    score = s[a] / na + math.sqrt(2 * math.log(tt) / na)
                    keys.append((10**12 - round(score * NANO)) * 8 + a)
                arm = min(keys) % 8
        else:
            if t <= k * ETC_M:
                arm = (t - 1) % k
            else:
                arm = min((10**6 - s[a]) * 8 + a for a in range(k)) % 8
        r = _reward(arm, t)
        n[arm] += 1
        s[arm] += r
    best = min((10**6 - s[a]) * 8 + a for a in range(k)) % 8
    return n, s, best


def test_ucb_matches_python(spark):
    from ocr_to_csv_spark.functions.banditops import T_STEPS, q_ucb_bandit

    n, s, best = _replay(True)
    r = q_ucb_bandit(spark, SF).collect()[0]
    assert (r.t_steps, r.n_0, r.n_1, r.n_2, r.s_total, r.best_arm) == (
        T_STEPS, n[0], n[1], n[2], sum(s), best,
    )
    # exploitation: the truly-best arm (p=0.7, arm 2) gets the most pulls
    assert n[2] == max(n)


def test_etc_matches_python_and_baselines(spark):
    from ocr_to_csv_spark.functions.banditops import T_STEPS, q_etc_bandit

    n, s, best = _replay(False)
    r = q_etc_bandit(spark, SF).collect()[0]
    assert (r.t_steps, r.n_0, r.n_1, r.n_2, r.s_total, r.best_arm) == (
        T_STEPS, n[0], n[1], n[2], sum(s), best,
    )
    # the committed arm is the truly best one on these streams
    assert best == 2
    # both policies beat always-playing the WORST arm
    worst_total = sum(_reward(0, t) for t in range(1, T_STEPS + 1))
    nu, su, _ = _replay(True)
    assert sum(s) > worst_total and sum(su) > worst_total
