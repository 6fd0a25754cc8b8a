"""Batch 115: Smith–Waterman + matrix profile — classic-DP python
mirrors and the defining invariants (SW ≥ 0 and ≥ 2·LCS-run bound on
identical strings; motif distance ≤ discord distance)."""

import glob

import pandas as pd

SF = "/root/testdata/sf0.001"


def _tab(name, cols):
    files = sorted(glob.glob(f"{SF}/{name}.parquet")) or sorted(
        glob.glob(f"{SF}/{name}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def _sw(a, b, match=2, mismatch=-1, gap=-1):
    m, n = len(a), len(b)
    prev = [0] * (n + 1)
    best = 0
    for i in range(1, m + 1):
        cur = [0] * (n + 1)
        for j in range(1, n + 1):
            sub = match if a[i - 1] == b[j - 1] else mismatch
            cur[j] = max(0, prev[j - 1] + sub, prev[j] + gap, cur[j - 1] + gap)
            best = max(best, cur[j])
        prev = cur
    return best


def test_smith_waterman_matches_python(spark):
    from ocr_to_csv_spark.functions.motifops import SW_MAXLEN, q_smith_waterman

    p = _tab("part", ["p_partkey", "p_brand", "p_name"]).sort_values(
        ["p_brand", "p_partkey"]
    )
    gold = {}
    for brand, grp in p.groupby("p_brand"):
        rows = list(grp.itertuples(index=False))
        for a, b in zip(rows, rows[1:]):
            gold[(brand, int(a.p_partkey), int(b.p_partkey))] = _sw(
                a.p_name[:SW_MAXLEN], b.p_name[:SW_MAXLEN]
            )
    got = {
        (r.p_brand, r.key_a, r.key_b): r.sw
        for r in q_smith_waterman(spark, SF).collect()
    }
    assert got == gold
    # self-alignment sanity on the fold itself: identical strings score
    # 2·len, disjoint alphabets score 0 (checked via the python mirror
    # the Spark result just matched)
    assert _sw("abcabc", "abcabc") == 12
    assert _sw("aaaa", "bbbb") == 0


def test_matrix_profile_matches_python(spark):
    from ocr_to_csv_spark.functions.motifops import MP_W, q_matrix_profile

    e = _tab("events", ["event_type", "ts"])
    secs = (e.ts - pd.Timestamp("1970-01-01")).dt.total_seconds()
    day = (secs // 86400).astype("int64")
    gold = {}
    for typ, grp in day.groupby(e.event_type):
        lo, hi = int(grp.min()), int(grp.max())
        xs = [0] * (hi - lo + 1)
        for d in grp:
            xs[int(d) - lo] += 1
        if len(xs) < 3 * MP_W:
            continue
        nw = len(xs) - (MP_W - 1)

        def dist(i, j):  # 1-based windows
            return sum(
                (xs[i - 1 + k] - xs[j - 1 + k]) ** 2 for k in range(MP_W)
            )

        motif = min(
            (dist(i, j), i, j)
            for i in range(1, nw + 1)
            for j in range(1, nw + 1)
            if abs(i - j) >= MP_W
        )
        prof = {
            i: min(
                dist(i, j)
                for j in range(1, nw + 1)
                if abs(i - j) >= MP_W
            )
            for i in range(1, nw + 1)
        }
        dmax = max(prof.values())
        discord = (dmax, min(i for i, v in prof.items() if v == dmax))
        gold[typ] = (nw, motif[0], motif[1], motif[2], discord[0], discord[1])
    got = {
        r.typ: (
            r.n_windows, r.motif_d, r.motif_i, r.motif_j,
            r.discord_d, r.discord_i,
        )
        for r in q_matrix_profile(spark, SF).collect()
    }
    assert got == gold
    for v in got.values():
        assert v[1] <= v[4]  # motif distance ≤ discord distance
