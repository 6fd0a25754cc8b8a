"""Batch 118: Selinger join-order DP + power iteration — python
mirrors (exact for the DP, tolerance-checked for the eigen floats)
and the defining semantics (DP optimality over all bushy splits;
Rayleigh quotient dominates any coordinate direction)."""

import glob
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _tab(name, cols):
    files = sorted(glob.glob(f"{SF}/{name}.parquet")) or sorted(
        glob.glob(f"{SF}/{name}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def test_join_order_dp_matches_python(spark):
    from ocr_to_csv_spark.functions.joinorderops import q_join_order_dp

    c = _tab("customer", ["c_custkey"])
    o = _tab("orders", ["o_custkey", "o_orderkey"])
    li = _tab("lineitem", ["l_orderkey", "l_suppkey"])
    s = _tab("supplier", ["s_suppkey"])
    n = [len(c), len(o), len(li), len(s)]
    e = {
        (0, 1): max(c.c_custkey.nunique(), o.o_custkey.nunique()),
        (1, 2): max(o.o_orderkey.nunique(), li.l_orderkey.nunique()),
        (2, 3): max(li.l_suppkey.nunique(), s.s_suppkey.nunique()),
    }

    def card(i, j):
        v = n[i]
        for k in range(i + 1, j + 1):
            v = (v * n[k]) // e[(k - 1, k)]
        return v

    cost, split = {}, {}
    for i in range(4):
        cost[(i, i)], split[(i, i)] = 0, -1
    for L in range(2, 5):
        for i in range(0, 5 - L):
            j = i + L - 1
            best = min(cost[(i, s_)] + cost[(s_ + 1, j)] for s_ in range(i, j))
            cost[(i, j)] = best + card(i, j)
            split[(i, j)] = next(
                s_ for s_ in range(i, j)
                if cost[(i, s_)] + cost[(s_ + 1, j)] == best
            )
    got = {
        (r.lo, r.hi): (r.est_card, r.best_cost, r.best_split)
        for r in q_join_order_dp(spark, SF).collect()
    }
    want = {
        (i, j): (card(i, j), cost[(i, j)], split[(i, j)])
        for (i, j) in cost
    }
    assert got == want
    # optimality: the full-chain cost is ≤ every specific split's cost
    full = got[(0, 3)][1]
    for s_ in range(3):
        assert full <= got[(0, s_)][1] + got[(s_ + 1, 3)][1] + got[(0, 3)][0]


def test_power_iteration_matches_python(spark):
    from ocr_to_csv_spark.functions.eigops import (
        EIG_D,
        EIG_K,
        EIG_SCALE,
        q_power_iteration,
    )

    emb = _tab("embeddings", ["embedding"])
    rows = [
        [int(round(float(v[i]) * EIG_SCALE)) for i in range(EIG_D)]
        for v in emb.embedding
    ]
    nn = len(rows)
    s1 = [sum(r[i] for r in rows) for i in range(EIG_D)]
    s2 = [
        [sum(r[i] * r[j] for r in rows) for j in range(EIG_D)]
        for i in range(EIG_D)
    ]
    cov = [
        [float(nn * s2[min(i, j)][max(i, j)] - s1[i] * s1[j]) for j in range(EIG_D)]
        for i in range(EIG_D)
    ]
    x = [1.0] * EIG_D
    for _ in range(EIG_K):
        y = [sum(cov[i][j] * x[j] for j in range(EIG_D)) for i in range(EIG_D)]
        m = max(abs(v) for v in y)
        x = [v / m for v in y]
    num = sum(
        x[i] * cov[i][j] * x[j] for i in range(EIG_D) for j in range(EIG_D)
    )
    den = sum(v * v for v in x)
    rayleigh = num / den
    got = {r.component: r.value for r in q_power_iteration(spark, SF).collect()}
    for i in range(EIG_D):
        assert math.isclose(got[i], x[i], rel_tol=1e-6, abs_tol=1e-6)
    assert math.isclose(got[-1], rayleigh, rel_tol=1e-6)
    # after K steps the iterate's Rayleigh quotient is near the top of
    # the spectrum — at least 90% of the best coordinate direction
    # (exact dominance only holds at convergence)
    assert got[-1] >= max(cov[i][i] for i in range(EIG_D)) * 0.9
    # max-abs normalization: some component is ±1
    assert any(abs(abs(got[i]) - 1.0) < 1e-9 for i in range(EIG_D))
