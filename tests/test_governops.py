"""Batch 132: MV selection + fairness audit — python mirrors including
the interaction effect the enumeration exists for, and the gap
identities."""

import glob

import pandas as pd

SF = "/root/testdata/sf0.001"


def _tab(name, cols):
    files = sorted(glob.glob(f"{SF}/{name}.parquet")) or sorted(
        glob.glob(f"{SF}/{name}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def test_mv_select_matches_python(spark):
    from ocr_to_csv_spark.functions.governops import (
        MV_BUDGET,
        MV_NAMES,
        MV_WORKLOAD,
        q_mv_select,
    )

    o = _tab("orders", ["o_orderdate", "o_orderstatus", "o_orderpriority", "o_custkey"])
    dt = pd.to_datetime(o.o_orderdate)
    base = len(o)
    sz = [
        dt.dt.year.nunique(),
        (dt.dt.year * 100 + dt.dt.month).nunique(),
        o.o_orderstatus.nunique(),
        o.o_orderpriority.nunique(),
        (o.o_custkey % 100).nunique(),
    ]
    rows = []
    for mask in range(1 << len(MV_NAMES)):
        storage = sum(sz[i] for i in range(len(sz)) if mask >> i & 1)
        if storage > MV_BUDGET:
            continue
        benefit = 0
        for _, freq, answers in MV_WORKLOAD:
            best = max(
                ((base - sz[i]) if mask >> i & 1 else 0 for i in answers),
            )
            benefit += freq * best
        rows.append((mask, storage, benefit))
    best_mask = min(
        (m for m, _, b in rows if b == max(r[2] for r in rows)),
    )
    want = sorted(
        [(m, s, b, int(m == best_mask)) for m, s, b in rows],
        key=lambda r: (-r[2], r[0]),
    )
    got = [
        (r.mask, r.storage_rows, r.benefit_rows, r.is_best)
        for r in q_mv_select(spark, SF).collect()
    ]
    assert got == want
    # the interaction matters: benefit is NOT additive when two chosen
    # MVs answer the same query (q1 answerable by m0 and m1)
    b = {m: bb for m, _, bb, _ in got}
    if 1 in b and 2 in b and 3 in b:
        assert b[3] < b[1] + b[2]


def test_fairness_audit_matches_python(spark):
    from ocr_to_csv_spark.functions.governops import (
        FA_GROUPS,
        FA_POS,
        q_fairness_audit,
    )
    from ocr_to_csv_spark.functions.noiseops import LN_D, LN_SCALE

    emb = _tab("embeddings", ["vec_id", "embedding", "label"])
    vecs = [
        (
            int(r.vec_id),
            int(r.label),
            [int(round(float(r.embedding[i]) * LN_SCALE)) for i in range(LN_D)],
        )
        for r in emb.itertuples(index=False)
    ]
    cen = {}
    for lbl in {g for _, g, _ in vecs}:
        mine = [v for _, g, v in vecs if g == lbl]
        cen[lbl] = [
            int(round(sum(v[i] for v in mine) / len(mine)))
            for i in range(LN_D)
        ]
    per = {}
    for vid, g, v in vecs:
        pred = min(
            (sum((v[i] - c[i]) ** 2 for i in range(LN_D)), lbl)
            for lbl, c in cen.items()
        )[1]
        grp = vid % FA_GROUPS
        y = 1 if g < FA_POS else 0
        yh = 1 if pred < FA_POS else 0
        n, pos, ppos, tp, fp = per.get(grp, (0, 0, 0, 0, 0))
        per[grp] = (n + 1, pos + y, ppos + yh, tp + y * yh, fp + (1 - y) * yh)
    stats = {}
    for grp, (n, pos, ppos, tp, fp) in per.items():
        stats[grp] = (
            n,
            pos * 1000 // n,
            ppos * 1000 // n,
            tp * 1000 // max(pos, 1),
            fp * 1000 // max(n - pos, 1),
        )
    pg = max(s[2] for s in stats.values()) - min(s[2] for s in stats.values())
    tg = max(s[3] for s in stats.values()) - min(s[3] for s in stats.values())
    got = {
        r.grp: (
            r.n, r.base_milli, r.pp_rate_milli, r.tpr_milli, r.fpr_milli,
            r.parity_gap_milli, r.tpr_gap_milli,
        )
        for r in q_fairness_audit(spark, SF).collect()
    }
    assert got == {g: (*s, pg, tg) for g, s in stats.items()}
    # gaps are consistent max−min readouts (per-group tpr/fpr ordering
    # is NOT guaranteed at sf0.001 sample sizes)
    assert pg >= 0 and tg >= 0
    assert all(v[5] == pg and v[6] == tg for v in got.values())
