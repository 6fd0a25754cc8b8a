"""Batch 110: LSH candidate-set evaluation — brute-force truth mirror,
confusion identities, and the planted-near-dup recall expectation."""

import glob
import re
from itertools import combinations

import pandas as pd

SF = "/root/testdata/sf0.001"


def _truth_py():
    from ocr_to_csv_spark.functions.dedupeval import TH_DEN, TH_NUM

    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    docs = pd.concat(
        pd.read_parquet(f, columns=["doc_id", "text"]) for f in files
    )
    sh = {}
    for _, r in docs.iterrows():
        toks = [x for x in re.split(r"\s+", r.text) if x != ""]
        sh[int(r.doc_id)] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    truth = set()
    for a, b in combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        if TH_DEN * inter >= TH_NUM * union:
            truth.add((a, b))
    return truth


def test_dedup_eval_truth_and_identities(spark):
    from ocr_to_csv_spark.functions.dedupeval import q_dedup_eval

    truth = _truth_py()
    r = q_dedup_eval(spark, SF).collect()[0]
    assert r.n_truth == len(truth) > 0
    assert r.tp + r.misses == r.n_truth
    assert r.tp + r.spurious == r.n_candidates
    assert r.precision == r.tp / r.n_candidates
    assert r.recall == r.tp / r.n_truth
    # the corpus plants clear near-dups (J ≈ 0.97+); 8-band LSH at
    # this signature size should catch nearly all of them
    assert r.recall >= 0.9
