"""Batch 146: Borda + Condorcet — python mirrors of the three rankers
and both aggregations, plus the social-choice pins (a Condorcet winner
if present beats all others; Borda and Condorcet winners may diverge
but both come from the candidate set)."""

import glob
import hashlib

import pandas as pd

SF = "/root/testdata/sf0.001"


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _ranks():
    from ocr_to_csv_spark.functions.textops import QC_BIAS, QC_BUCKETS

    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    docs = pd.concat(
        pd.read_parquet(f, columns=["doc_id", "text"]) for f in files
    )
    rows = []
    for r in docs.itertuples(index=False):
        toks = [t for t in str(r.text).split() if t]
        q = QC_BIAS + sum(
            (_h32(t) % QC_BUCKETS) * 2654435761 % 1001 - 500 for t in toks
        )
        rows.append((int(r.doc_id), q, len(toks), toks.count("table")))
    ranks = {}
    for mi, name in ((1, "r_q"), (2, "r_len"), (3, "r_tf")):
        order = sorted(rows, key=lambda t: (-t[mi], t[0]))
        for pos, t in enumerate(order, 1):
            ranks.setdefault(t[0], {})[name] = pos
    return ranks


def _borda(ranks):
    from ocr_to_csv_spark.functions.voteops import VOTE_K, VOTE_TOP

    pts = {}
    lists = {}
    for did, rr in ranks.items():
        for name in ("r_q", "r_len", "r_tf"):
            if rr[name] <= VOTE_K:
                pts[did] = pts.get(did, 0) + VOTE_K - rr[name]
                lists[did] = lists.get(did, 0) + 1
    return sorted(
        ((d, pts[d], lists[d]) for d in pts), key=lambda t: (-t[1], t[0])
    )[:VOTE_TOP]


def test_borda_matches_python(spark):
    from ocr_to_csv_spark.functions.voteops import q_borda_count

    exp = _borda(_ranks())
    got = [
        (r.doc_id, r.borda, r.n_lists)
        for r in q_borda_count(spark, SF).collect()
    ]
    assert got == exp


def test_condorcet_matches_python(spark):
    from ocr_to_csv_spark.functions.voteops import (
        COND_TOP, q_condorcet_check,
    )

    ranks = _ranks()
    cand = [d for d, _, _ in _borda(ranks)[:COND_TOP]]
    borda = dict((d, b) for d, b, _ in _borda(ranks))
    beats = {}
    for a in cand:
        nb = 0
        for b in cand:
            if a == b:
                continue
            w = sum(
                1
                for name in ("r_q", "r_len", "r_tf")
                if ranks[a][name] < ranks[b][name]
            )
            if w >= 2:
                nb += 1
        beats[a] = nb
    exp = sorted(
        ((d, borda[d], beats[d], int(beats[d] == COND_TOP - 1)) for d in cand),
        key=lambda t: (-t[2], t[0]),
    )
    got = [
        (r.doc_id, r.borda, r.n_beats, r.is_condorcet)
        for r in q_condorcet_check(spark, SF).collect()
    ]
    assert got == exp
    winners = [d for d, _, nb, f in got if f == 1]
    assert len(winners) <= 1  # at most one Condorcet winner
