"""Batch 81: PSM nearest-control matching + greedy max coverage."""

SF = "/root/testdata/sf0.001"


def _py_units(sf_dir):
    import glob
    import math

    import pandas as pd

    def load(tbl, cols):
        files = sorted(glob.glob(f"{sf_dir}/{tbl}.parquet")) or sorted(
            glob.glob(f"{sf_dir}/{tbl}.parquet/*.parquet")
        )
        return pd.concat(pd.read_parquet(f, columns=cols) for f in files)

    c = load("customer", ["c_custkey", "c_acctbal"])
    with_orders = set(load("orders", ["o_custkey"]).o_custkey.astype(int))
    out = []
    for _, r in c.iterrows():
        k = int(r.c_custkey)
        if k in with_orders:
            score = math.floor(round(r.c_acctbal * 100) / 100)
            out.append((k, k % 2, score))
    return out


def test_psm_matches_bruteforce(spark):
    """Every treated unit matches the truly nearest control score
    within the caliper (prev preferred on distance ties), against a
    brute-force nearest-neighbor mirror."""
    from ocr_to_csv_spark.functions.causalops import CALIPER, q_psm_match

    units = _py_units(SF)
    ctl_by_score = {}
    for k, arm, s in units:
        if arm == 0:
            ctl_by_score[s] = min(ctl_by_score.get(s, k), k)
    cscores = sorted(ctl_by_score)
    want = {}
    for k, arm, s in units:
        if arm != 1:
            continue
        prev = max((c for c in cscores if c <= s), default=None)
        nxt = min((c for c in cscores if c > s), default=None)
        if prev is not None and (nxt is None or s - prev <= nxt - s):
            best, gap = prev, s - prev
        elif nxt is not None:
            best, gap = nxt, nxt - s
        else:
            continue
        if gap <= CALIPER:
            want[k] = (ctl_by_score[best], gap)
    got = {
        r.treated_k: (r.control_k, r.gap)
        for r in q_psm_match(spark, SF).collect()
    }
    assert got == want
    assert got, "caliper must admit matches at this sf"


def test_psm_controls_never_treated(spark):
    """Matched controls are genuine arm-0 units and gaps respect the
    caliper."""
    from ocr_to_csv_spark.functions.causalops import CALIPER, q_psm_match

    rows = q_psm_match(spark, SF).collect()
    for r in rows:
        assert r.control_k % 2 == 0
        assert r.treated_k % 2 == 1
        assert 0 <= r.gap <= CALIPER


def test_max_coverage_matches_python(spark):
    """Distributed greedy equals the independent sequential greedy."""
    from ocr_to_csv_spark.functions.causalops import (
        _py_max_coverage,
        q_max_coverage,
    )

    got = sorted(
        (r.rank, r.doc_id, r.gain) for r in q_max_coverage(spark, SF).collect()
    )
    assert got == _py_max_coverage(SF)
    assert len(got) >= 2


def test_max_coverage_gains_decrease(spark):
    """Submodularity: greedy marginal gains are non-increasing."""
    from ocr_to_csv_spark.functions.causalops import q_max_coverage

    rows = sorted(q_max_coverage(spark, SF).collect(), key=lambda r: r.rank)
    gains = [r.gain for r in rows]
    assert gains == sorted(gains, reverse=True)
    assert all(g > 0 for g in gains)
