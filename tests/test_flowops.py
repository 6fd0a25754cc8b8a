"""Batch 138: Johnson flow shop + bipartiteness audit — python mirrors
plus Johnson's optimality pins (never worse than id order, never below
the classic lower bound, and equal to the brute-force optimum on the
8-job prefix)."""

import glob
import itertools

import pandas as pd

SF = "/root/testdata/sf0.001"


def _lineitem():
    files = sorted(glob.glob(f"{SF}/lineitem.parquet")) or sorted(
        glob.glob(f"{SF}/lineitem.parquet/*.parquet")
    )
    return pd.concat(
        pd.read_parquet(
            f, columns=["l_partkey", "l_quantity", "l_extendedprice"]
        )
        for f in files
    )


def _jobs():
    from ocr_to_csv_spark.functions.flowops import FS_JOBS

    li = _lineitem()
    li["cents"] = (li.l_extendedprice * 100).round().astype("int64")
    per = li.groupby("l_partkey").agg(
        a=("l_quantity", lambda s: int(s.astype("int64").sum())),
        cents=("cents", "sum"),
    )
    per["b"] = per.cents % 997 + 1
    per = per.reset_index().rename(columns={"l_partkey": "job"})
    per = per.sort_values(["a", "job"], ascending=[False, True])
    return per.head(FS_JOBS)[["job", "a", "b"]]


def _makespan(seq):
    c1 = c2 = 0
    for a, b in seq:
        c1 += a
        c2 = max(c2, c1) + b
    return c2


def test_johnson_matches_python_and_is_optimal(spark):
    from ocr_to_csv_spark.functions.flowops import q_johnson_flowshop

    jobs = _jobs()
    recs = list(jobs.itertuples(index=False))
    jseq = sorted(
        recs,
        key=lambda r: (
            0 if r.a < r.b else 1,
            r.a if r.a < r.b else -r.b,
            r.job,
        ),
    )
    idseq = sorted(recs, key=lambda r: r.job)
    ms = _makespan([(r.a, r.b) for r in jseq])
    ms_id = _makespan([(r.a, r.b) for r in idseq])
    lb = max(
        sum(r.a for r in recs) + min(r.b for r in recs),
        sum(r.b for r in recs) + min(r.a for r in recs),
    )
    r = q_johnson_flowshop(spark, SF).collect()[0]
    assert (r.n_jobs, r.makespan, r.makespan_idorder, r.lower_bound) == (
        len(recs), ms, ms_id, lb,
    )
    assert ms <= ms_id and ms >= lb
    # brute force on an 8-job subset: Johnson == optimum
    sub = recs[:8]
    best = min(
        _makespan([(r.a, r.b) for r in perm])
        for perm in itertools.permutations(sub)
    )
    jsub = sorted(
        sub,
        key=lambda r: (
            0 if r.a < r.b else 1,
            r.a if r.a < r.b else -r.b,
            r.job,
        ),
    )
    assert _makespan([(r.a, r.b) for r in jsub]) == best


def test_bipartite_check_matches_python(spark):
    from ocr_to_csv_spark.functions.flowops import (
        BP_ROUNDS, BP_SEED_MOD, q_bipartite_check,
    )

    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    ids = sorted(
        pd.concat(pd.read_parquet(f, columns=["doc_id"]) for f in files).doc_id
    )
    n = len(ids)
    edges = set()
    for d in ids:
        if d % 3 != 0:
            edges.add((d, (d * 2 + 1) % n))
        if d % 2 == 0:
            edges.add((d, (d * 7 + 3) % n))
        if d % 6 == 1:
            edges.add((d, (d + n // 2) % n))
    sym = {}
    for u, v in edges:
        sym.setdefault(u, set()).add(v)
        sym.setdefault(v, set()).add(u)
    exp = {}
    for seed in [i for i in ids if i % BP_SEED_MOD == 0]:
        state = {(seed, 0)}
        for _ in range(BP_ROUNDS):
            state |= {
                (w, 1 - p) for (v, p) in state for w in sym.get(v, ())
            }
        nodes = {}
        for v, p in state:
            nodes.setdefault(v, set()).add(p)
        conflicts = sum(1 for ps in nodes.values() if len(ps) > 1)
        exp[seed] = (len(nodes), conflicts, int(conflicts == 0))
    got = {
        r.seed: (r.n_reached, r.n_conflict, r.bipartite_ball)
        for r in q_bipartite_check(spark, SF).collect()
    }
    assert got == exp
    # the link graph has odd cycles somewhere: at least one seed sees one
    assert any(v[1] > 0 for v in got.values())
