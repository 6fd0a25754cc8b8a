"""Batch 130: rec coverage/novelty + exposure Gini — python mirrors of
the co-visitation recommender and both audits, plus the health-signal
semantics (coverage ≤ 1000; Gini in [0, 1000))."""

import glob
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _li():
    files = sorted(glob.glob(f"{SF}/lineitem.parquet")) or sorted(
        glob.glob(f"{SF}/lineitem.parquet/*.parquet")
    )
    return pd.concat(
        pd.read_parquet(f, columns=["l_orderkey", "l_partkey"]) for f in files
    )


def _recs(li, cat, k):
    baskets = {}
    for r in li.itertuples(index=False):
        baskets.setdefault(int(r.l_orderkey), set()).add(
            int(r.l_partkey) % cat
        )
    cnt = {}
    for items in baskets.values():
        for a in items:
            for b in items:
                if a != b:
                    cnt[(a, b)] = cnt.get((a, b), 0) + 1
    recs = []
    by_a = {}
    for (a, b), c in cnt.items():
        by_a.setdefault(a, []).append((c, b))
    for a, lst in by_a.items():
        for c, b in sorted(lst, key=lambda p: (-p[0], p[1]))[:k]:
            recs.append((a, b, c))
    return recs


def test_rec_coverage_matches_python(spark):
    from ocr_to_csv_spark.functions.recops import REC_CAT, REC_K, q_rec_coverage

    li = _li()
    recs = _recs(li, REC_CAT, REC_K)
    items = (li.l_partkey % REC_CAT).astype(int)
    pop = items.value_counts().to_dict()
    n_events = len(items)
    n_catalog = len(pop)
    n_recs = len(recs)
    nov_sum = sum(
        int(round(-math.log2(pop[b] / n_events) * 1e9)) for _, b, _ in recs
    )
    n_recommended = len({b for _, b, _ in recs})
    r = q_rec_coverage(spark, SF).collect()[0]
    assert (r.n_recs, r.n_recommended, r.n_catalog) == (
        n_recs, n_recommended, n_catalog,
    )
    assert r.coverage_milli == n_recommended * 1000 // n_catalog
    assert r.novelty_nano == nov_sum // n_recs
    assert 0 < r.coverage_milli <= 1000


def test_rec_exposure_gini_matches_python(spark):
    from ocr_to_csv_spark.functions.recops import (
        REC_CAT,
        REC_K,
        q_rec_exposure_gini,
    )

    li = _li()
    recs = _recs(li, REC_CAT, REC_K)
    expo = {}
    for _, b, _ in recs:
        expo[b] = expo.get(b, 0) + 1
    catalog = sorted({int(p) % REC_CAT for p in li.l_partkey})
    full = sorted(
        ((expo.get(i, 0), i) for i in catalog), key=lambda p: (p[0], p[1])
    )
    n = len(full)
    se = sum(e for e, _ in full)
    sre = sum((r + 1) * e for r, (e, _) in enumerate(full))
    gini = (2 * sre - (n + 1) * se) * 1000 // (n * se)
    r = q_rec_exposure_gini(spark, SF).collect()[0]
    assert (r.n_catalog, r.total_exposure, r.gini_milli) == (n, se, gini)
    assert 0 <= r.gini_milli < 1000
