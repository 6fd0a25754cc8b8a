"""Batch 79: deterministic Luby MIS + Mann–Kendall trend test."""

SF = "/root/testdata/sf0.001"


def test_mis_matches_sequential_greedy(spark):
    """Parallel local-minimum MIS equals the sequential greedy in
    priority order (the lexicographically-first MIS)."""
    from ocr_to_csv_spark.functions.misops import _py_greedy_mis, q_luby_mis

    got = sorted((r.id, r.in_mis) for r in q_luby_mis(spark, SF).collect())
    assert got == _py_greedy_mis(SF)


def test_mis_is_independent_and_maximal(spark):
    """No edge joins two MIS nodes; every non-MIS node has an MIS
    neighbor (the defining pair of invariants)."""
    from ocr_to_csv_spark.functions.linkpred import _undirected_edges
    from ocr_to_csv_spark.functions.misops import q_luby_mis

    mis = {r.id for r in q_luby_mis(spark, SF).collect() if r.in_mis}
    edges = [(r.lo, r.hi) for r in _undirected_edges(spark, SF).collect()]
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for a, b in edges:
        assert not (a in mis and b in mis), (a, b)
    for k, ns in adj.items():
        if k not in mis:
            assert ns & mis, k


def test_mann_kendall_matches_python(spark):
    """S and the tie-corrected variance match a brute-force Python
    recomputation of the daily series."""
    import glob

    import pandas as pd

    from ocr_to_csv_spark.functions.misops import q_mann_kendall
    from ocr_to_csv_spark.functions.statsops import TS_FROM, TS_TO

    files = sorted(glob.glob(f"{SF}/events.parquet")) or sorted(
        glob.glob(f"{SF}/events.parquet/*.parquet")
    )
    ev = pd.concat(pd.read_parquet(f, columns=["ts", "value"]) for f in files)
    ev = ev[(ev.ts >= TS_FROM) & (ev.ts < TS_TO)]
    daily = (
        (ev.value * 100).round().astype("int64")
        .groupby(ev.ts.dt.normalize()).sum()
        .sort_index()
        .tolist()
    )
    n = len(daily)
    s = sum(
        (daily[j] > daily[i]) - (daily[j] < daily[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(daily).values())
    var18 = n * (n - 1) * (2 * n + 5) - tie
    got = q_mann_kendall(spark, SF).first()
    assert (got.s_stat, got.n_days, got.var18) == (s, n, var18)


def test_mann_kendall_hand_fixture():
    """Hand-checked S on a tiny series with a tie: [1, 3, 2, 3]."""
    vals = [1, 3, 2, 3]
    s = sum(
        (vals[j] > vals[i]) - (vals[j] < vals[i])
        for i in range(4)
        for j in range(i + 1, 4)
    )
    # pairs: (1,3)+ (1,2)+ (1,3)+ (3,2)- (3,3)0 (2,3)+  => S = 3
    assert s == 3
