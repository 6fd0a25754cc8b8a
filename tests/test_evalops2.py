"""Batch 117: team-draft interleaving + histogram selectivity — full
python mirrors of the draft procedure and the estimate arithmetic."""

import glob
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

SF = "/root/testdata/sf0.001"


def _tab(name, cols):
    files = sorted(glob.glob(f"{SF}/{name}.parquet")) or sorted(
        glob.glob(f"{SF}/{name}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def _draft(la, lb, a_pref):
    acc = []  # (doc, team)
    for _ in range(2 * len(la) if la else 12):
        picked = {d for d, _ in acc}
        ca = next((x for x in la if x not in picked), None)
        cb = next((x for x in lb if x not in picked), None)
        na = sum(1 for _, t in acc if t == 0)
        nb = len(acc) - na
        pick_a = na < nb or (na == nb and a_pref)
        if pick_a:
            chosen = (ca, 0) if ca is not None else ((cb, 1) if cb is not None else None)
        else:
            chosen = (cb, 1) if cb is not None else ((ca, 0) if ca is not None else None)
        if chosen is not None:
            acc.append(chosen)
    return acc


def test_team_draft_matches_python(spark):
    from ocr_to_csv_spark.functions.evalops2 import TD_K, TD_TERMS, q_team_draft

    d = _tab("documents", ["doc_id", "text", "n_chars"])
    gold = {}
    for qid, term in enumerate(TD_TERMS):
        cands = []
        for _, r in d.iterrows():
            tf = sum(1 for t in str(r.text).split() if t == term)
            if tf > 0:
                cands.append((int(r.doc_id), tf, int(r.n_chars)))
        la = [c[0] for c in sorted(cands, key=lambda c: (-c[1], c[0]))[:TD_K]]
        lb = [c[0] for c in sorted(cands, key=lambda c: (-c[2], c[0]))[:TD_K]]
        acc = _draft(la, lb, qid % 2 == 0)
        ca = sum(1 for doc, t in acc if t == 0 and doc % 3 == 0)
        cb = sum(1 for doc, t in acc if t == 1 and doc % 3 == 0)
        w = "A" if ca > cb else ("B" if ca < cb else "tie")
        gold[qid] = (term, len(acc), ca, cb, w)
    got = {
        r.qid: (r.term, r.n_shown, r.clicks_a, r.clicks_b, r.winner)
        for r in q_team_draft(spark, SF).collect()
    }
    assert got == gold
    # both teams get equal exposure up to one pick when lists overlap
    for qid, (_, n, _, _, _) in gold.items():
        assert n >= 1


def test_selectivity_est_matches_python(spark):
    from ocr_to_csv_spark.functions.evalops2 import SEL_B, SEL_PREDS, q_selectivity_est

    o = _tab("orders", ["o_totalprice"])
    vs = [
        int(Decimal(repr(float(v * 100))).quantize(Decimal(1), ROUND_HALF_UP))
        for v in o.o_totalprice
    ]
    lo, hi1 = min(vs), max(vs) + 1
    w = (hi1 - lo + SEL_B - 1) // SEL_B
    hist = {}
    for v in vs:
        b = (v - lo) // w
        hist[b] = hist.get(b, 0) + 1
    gold = {}
    for pid, pl, ph in SEL_PREDS:
        p_lo = lo + (hi1 - lo) * pl // 100
        p_hi = lo + (hi1 - lo) * ph // 100
        est_num = sum(
            max(0, min(p_hi, lo + (b + 1) * w) - max(p_lo, lo + b * w)) * c
            for b, c in hist.items()
        )
        actual = sum(1 for v in vs if p_lo <= v < p_hi)
        est = est_num // w
        gold[pid] = (p_lo, p_hi, est, actual, abs(est - actual))
    got = {
        r.pred_id: (r.p_lo, r.p_hi, r.est_rows, r.actual_rows, r.abs_err)
        for r in q_selectivity_est(spark, SF).collect()
    }
    assert got == gold
    # the 0-100% panel partitions the domain: actuals sum to n
    assert sum(v[3] for v in gold.values()) == len(vs)
