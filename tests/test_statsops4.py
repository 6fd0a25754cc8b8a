"""Batch 82: one-way ANOVA F, Cramér's V, McNemar — pure-python
mirrors computed in the SAME fixed IEEE order as the Spark plans."""

import glob
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _load(tbl, cols):
    files = sorted(glob.glob(f"{SF}/{tbl}.parquet")) or sorted(
        glob.glob(f"{SF}/{tbl}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def test_anova_f_matches_python_mirror(spark):
    from ocr_to_csv_spark.functions.statsops4 import (
        K_GROUPS,
        PRIORITIES,
        q_anova_f,
    )

    o = _load("orders", ["o_orderpriority", "o_totalprice"])
    vals = {p: [] for p in PRIORITIES}
    for prio, price in zip(o.o_orderpriority, o.o_totalprice):
        vals[prio].append(math.floor(price))
    ns = [len(vals[p]) for p in PRIORITIES]
    ss = [sum(vals[p]) for p in PRIORITIES]
    assert all(n > 0 for n in ns), "every priority must appear at this sf"
    n_total = sum(ns)
    s_all = sum(ss)
    q_total = sum(v * v for p in PRIORITIES for v in vals[p])
    # same left-to-right order as the plan: s1²/n1 + s2²/n2 + ...
    grp_term = 0.0
    first = True
    for n, s in zip(ns, ss):
        t = float(s) * float(s) / float(n)
        grp_term = t if first else grp_term + t
        first = False
    ssb = grp_term - float(s_all) * float(s_all) / float(n_total)
    ssw = float(q_total) - grp_term
    f_stat = (ssb / float(K_GROUPS - 1)) / (
        ssw / (float(n_total) - float(K_GROUPS))
    )

    row = q_anova_f(spark, SF).collect()[0]
    assert row.n_total == n_total
    assert row.k_groups == K_GROUPS
    assert row.ss_between == ssb
    assert row.ss_within == ssw
    assert row.f_stat == f_stat
    assert 0.0 < row.f_stat < 100.0  # sanity: price ⟂ priority ⇒ F ≈ 1


def test_cramers_v_matches_python_mirror(spark):
    from ocr_to_csv_spark.functions.statsops4 import q_cramers_v

    o = _load("orders", ["o_custkey", "o_orderpriority"])
    c = _load("customer", ["c_custkey", "c_mktsegment"])
    seg_of = dict(zip(c.c_custkey, c.c_mktsegment))
    obs = {}
    for k, prio in zip(o.o_custkey, o.o_orderpriority):
        cell = (seg_of[k], prio)
        obs[cell] = obs.get(cell, 0) + 1
    rows = {}
    cols = {}
    for (seg, prio), v in obs.items():
        rows[seg] = rows.get(seg, 0) + v
        cols[prio] = cols.get(prio, 0) + v
    n = sum(obs.values())
    terms = []
    for (seg, prio), v in obs.items():
        dev = v * n - rows[seg] * cols[prio]
        terms.append(
            float(dev * dev) / (float(n) * float(rows[seg]) * float(cols[prio]))
        )
    chi2 = 0.0
    for t in sorted(terms):  # the sorted fold
        chi2 = chi2 + t
    v_stat = math.sqrt(
        chi2 / (float(n) * float(min(len(rows) - 1, len(cols) - 1)))
    )

    row = q_cramers_v(spark, SF).collect()[0]
    assert row.n_total == n
    assert row.n_rows == len(rows)
    assert row.n_cols == len(cols)
    assert row.chi2 == chi2
    assert row.cramers_v == v_stat
    assert 0.0 <= row.cramers_v <= 1.0


def test_mcnemar_consistent_with_kappa_counts(spark):
    """The 2×2 paired table must equal cohens_kappa's (same classifier
    pair), and the statistic is the exact rational over the
    discordant cells."""
    from ocr_to_csv_spark.functions.matchops import q_cohens_kappa
    from ocr_to_csv_spark.functions.statsops4 import q_mcnemar

    m = q_mcnemar(spark, SF).collect()[0]
    k = q_cohens_kappa(spark, SF).collect()[0]
    assert (m.n11, m.n10, m.n01, m.n00) == (k.n11, k.n10, k.n01, k.n00)
    d = m.n10 - m.n01
    assert m.stat_num == d * d
    assert m.stat_cc_num == (abs(d) - 1) ** 2 if abs(d) > 0 else m.stat_cc_num == 0
    assert m.stat_den == m.n10 + m.n01
    assert m.stat_den > 0, "discordant pairs must exist at this sf"


def test_anova_single_aggregate_plan(spark):
    """The ANOVA scan must collapse in ONE aggregate pass: no join, no
    window, no second exchange over the orders table."""
    from ocr_to_csv_spark.functions.statsops4 import q_anova_f

    plan = q_anova_f(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" not in plan
    assert plan.count("Exchange") <= 1
