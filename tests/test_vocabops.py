"""Batch 98: Good–Turing smoothing table + Chao1 richness, checked
against a pure-Python frequency-spectrum recomputation at sf0.001."""

import glob
import re
from collections import Counter

import pandas as pd

SF = "/root/testdata/sf0.001"


def _spectrum_py():
    from ocr_to_csv_spark.functions.vocabops import GRAM_N

    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    texts = pd.concat(
        [pd.read_parquet(f, columns=["text"]) for f in files]
    )["text"].tolist()
    tf = Counter()
    for t in texts:
        toks = [x for x in re.split(r"\s+", t) if x != ""]
        tf.update(
            " ".join(toks[i : i + GRAM_N])
            for i in range(len(toks) - GRAM_N + 1)
        )
    return Counter(tf.values())  # r -> N_r


def test_good_turing_matches_python(spark):
    from ocr_to_csv_spark.functions.vocabops import R_MAX, q_good_turing

    spec = _spectrum_py()
    got = q_good_turing(spark, SF).collect()
    expect_rs = sorted(r for r in spec if r <= R_MAX)
    assert [r.r for r in got] == expect_rs
    for row in got:
        n_r, n_next = spec[row.r], spec.get(row.r + 1, 0)
        assert row.n_types == n_r
        assert row.n_next == n_next
        assert row.rstar_num == (row.r + 1) * n_next
        assert row.rstar_den == n_r
        assert row.r_star == row.rstar_num / row.rstar_den


def test_good_turing_adjusted_mass_is_conservative(spark):
    """Σ_r r*·N_r over all r (with r* = r for r > R_MAX, plus the
    unseen mass N_1) must equal the total token count — the identity
    Good–Turing smoothing is built on, evaluated in exact integers via
    the rational numerators: Σ (r+1)·N_{r+1} telescopes."""
    spec = _spectrum_py()
    n_tokens = sum(r * n for r, n in spec.items())
    # telescoping: Σ_{r≥0} (r+1)·N_{r+1} = Σ_{r≥1} r·N_r = n_tokens
    assert sum((r + 1) * spec.get(r + 1, 0) for r in range(0, max(spec))) \
        == n_tokens


def test_chao1_matches_python(spark):
    from ocr_to_csv_spark.functions.vocabops import q_chao1

    spec = _spectrum_py()
    s_obs = sum(spec.values())
    n_tokens = sum(r * n for r, n in spec.items())
    f1, f2 = spec.get(1, 0), spec.get(2, 0)
    r = q_chao1(spark, SF).collect()[0]
    assert r.s_obs == s_obs
    assert r.n_tokens == n_tokens
    assert r.f1 == f1
    assert r.f2 == f2
    assert r.chao1 == s_obs + (f1 * f1) / (2 * f2)
    assert r.chao1_bc == s_obs + (f1 * (f1 - 1)) / (2 * (f2 + 1))
    assert r.p0 == f1 / n_tokens
    # estimator sanity: richness estimate ≥ observed, unseen mass in (0,1)
    assert r.chao1 >= s_obs
    assert 0 < r.p0 < 1
