"""Batch 156: transportation heuristics — python mirrors of both
allocation rules, plus the OR pins (both feasible: margins exhausted,
allocation totals equal n; the cost-aware greedy never loses to the
order-blind corner rule on this instance)."""

import glob

import pandas as pd

SF = "/root/testdata/sf0.001"


def _margins():
    from ocr_to_csv_spark.functions.rakingops import REGIONS, SEGMENTS

    def rd(name, cols):
        files = sorted(glob.glob(f"{SF}/{name}.parquet")) or sorted(
            glob.glob(f"{SF}/{name}.parquet/*.parquet")
        )
        return pd.concat(pd.read_parquet(f, columns=cols) for f in files)

    c = rd("customer", ["c_custkey", "c_nationkey", "c_mktsegment"])
    n = rd("nation", ["n_nationkey", "n_regionkey"])
    r = rd("region", ["r_regionkey", "r_name"])
    j = c.merge(n, left_on="c_nationkey", right_on="n_nationkey").merge(
        r, left_on="n_regionkey", right_on="r_regionkey"
    )
    s = [int((j.r_name == g).sum()) for g in REGIONS]
    d = [int((j.c_mktsegment == seg).sum()) for seg in SEGMENTS]
    return s, d


def _nw(s, d, costs):
    s, d = list(s), list(d)
    alloc = [0] * 25
    cost = 0
    for k in range(25):
        i, j = k // 5, k % 5
        a = min(s[i], d[j])
        s[i] -= a
        d[j] -= a
        cost += a * costs[i][j]
        alloc[k] = a
    return alloc, cost, sum(s) + sum(d)


def _lcm(s, d, costs):
    s, d = list(s), list(d)
    alloc = [0] * 25
    cost = 0
    for _ in range(25):
        best = None
        for k in range(25):
            i, j = k // 5, k % 5
            if s[i] > 0 and d[j] > 0:
                key = costs[i][j] * 64 + k
                if best is None or key < best:
                    best = key
        if best is None:
            continue
        k = best % 64
        i, j = k // 5, k % 5
        a = min(s[i], d[j])
        s[i] -= a
        d[j] -= a
        cost += a * costs[i][j]
        alloc[k] += a
    return alloc, cost, sum(s) + sum(d)


def test_transport_nw_matches_python(spark):
    from ocr_to_csv_spark.functions.rakingops import REGIONS, SEGMENTS
    from ocr_to_csv_spark.functions.transportops import (
        COSTS, q_transport_nw,
    )

    s, d = _margins()
    alloc, cost, left = _nw(s, d, COSTS)
    rows = q_transport_nw(spark, SF).collect()
    got = {(r.reg, r.seg): (r.cost_cell, r.alloc) for r in rows}
    for k in range(25):
        i, j = k // 5, k % 5
        assert got[(REGIONS[i], SEGMENTS[j])] == (COSTS[i][j], alloc[k])
    assert rows[0].total_cost == cost
    assert rows[0].feasible == 1 and left == 0
    assert sum(a for _, a in got.values()) == sum(s)


def test_transport_lcm_matches_python_and_beats_nw(spark):
    from ocr_to_csv_spark.functions.rakingops import REGIONS, SEGMENTS
    from ocr_to_csv_spark.functions.transportops import (
        COSTS, q_transport_lcm,
    )

    s, d = _margins()
    alloc, cost, left = _lcm(s, d, COSTS)
    _, nw_cost, _ = _nw(s, d, COSTS)
    rows = q_transport_lcm(spark, SF).collect()
    got = {(r.reg, r.seg): r.alloc for r in rows}
    for k in range(25):
        i, j = k // 5, k % 5
        assert got[(REGIONS[i], SEGMENTS[j])] == alloc[k]
    assert rows[0].total_cost == cost
    assert rows[0].nw_cost == nw_cost
    assert rows[0].feasible == 1 and left == 0
    # the cost-aware greedy does not lose to the order-blind rule here
    assert cost <= nw_cost
