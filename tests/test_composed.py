"""Batch 12 (functions/composed.py): Zipf slope on a crafted
power-law corpus, hard-negative label/cell invariants, leakage-audit
cross-checks — properties the DuckDB oracle equality can't express."""

import math

from pyspark.sql import functions as F

from ocr_to_csv_spark.functions.composed import (
    HN_K,
    HN_Q_HI,
    HN_Q_LO,
    q_hard_negatives,
    q_split_leakage_audit,
    q_zipf_fit,
)
from ocr_to_csv_spark.functions.dataops import q_split_assign
from ocr_to_csv_spark.functions.dedup import q_lsh_pairs
from ocr_to_csv_spark.functions.similarity import q_ivf_assign

SF = "/root/testdata/sf0.001"


def _docs(spark, tmp_path, rows):
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in enumerate(rows)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(p)
    return str(tmp_path)


def test_zipf_fit_recovers_exact_power_law(spark, tmp_path):
    # counts c_r = round(1000 / r) approximate slope -1; build an EXACT
    # slope -1 in log-space instead: c_r = 2^(20-r) for r = 1..8 gives
    # ln c = ln 2^20 - r ln 2 — linear in r, NOT ln r. So use c_r =
    # floor(1000/r): regression over 8 ranks lands near -1.
    text = []
    for r in range(1, 9):
        text.extend([f"w{r}"] * (1000 // r))
    d = _docs(spark, tmp_path, [" ".join(text)])
    row = q_zipf_fit(spark, d).collect()[0]
    assert row["n_terms"] == 8
    assert -1.1 < row["slope"] < -0.9
    # independent least-squares replay
    xs = [math.log(r) for r in range(1, 9)]
    ys = [math.log(1000 // r) for r in range(1, 9)]
    n = 8
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    want = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(row["slope"] - want) < 5e-4


def test_hard_negatives_invariants(spark):
    rows = q_hard_negatives(spark, SF).collect()
    assert rows
    emb = {
        r["vec_id"]: (r["label"], )
        for r in spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    assign = {
        r["vec_id"]: r["centroid"] for r in q_ivf_assign(spark, SF).collect()
    }
    per_q = {}
    for r in rows:
        q, neg = r["query_id"], r["neg_id"]
        assert HN_Q_LO <= q < HN_Q_HI and neg >= HN_Q_HI
        assert emb[q][0] != emb[neg][0], "negative must carry another label"
        assert assign[q] == assign[neg] == r["cell"], "must stay in the cell"
        per_q.setdefault(q, []).append(r["sim"])
    assert all(len(v) <= HN_K for v in per_q.values())
    for sims in per_q.values():  # top-k: descending similarity
        assert sims == sorted(sims, reverse=True)


def test_split_leakage_audit_totals(spark):
    audit = q_split_leakage_audit(spark, SF).collect()
    total = sum(r["n_pairs"] for r in audit)
    assert total == q_lsh_pairs(spark, SF).count()
    for r in audit:
        want_leaky = r["n_pairs"] if r["split_a"] != r["split_b"] else 0
        assert r["n_leaky"] == want_leaky
    # exact duplicates can never leak across splits: same text -> same
    # split by construction of the content-hash assignment
    sp = q_split_assign(spark, SF)
    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.lower("text").alias("t")
    )
    j = (
        sp.join(d, "doc_id")
        .groupBy("t")
        .agg(F.count_distinct("split").alias("ns"))
        .agg(F.max("ns").alias("m"))
        .collect()[0]
    )
    assert j["m"] == 1
