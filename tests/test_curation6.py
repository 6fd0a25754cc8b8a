"""Curation batch 8 (functions/curation6.py): winnowing fingerprint
guarantee and feature-hashing linearity — properties the DuckDB oracle
equality can't express."""

import pyspark.sql.functions as F

from ocr_to_csv_spark.functions.curation6 import (
    HE_DIM,
    W_K,
    W_WIN,
    q_hash_embed,
    q_winnowing,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, tmp_path, rows):
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in enumerate(rows)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(p)
    return str(tmp_path)


def test_winnowing_shared_substring_shares_a_fingerprint(spark, tmp_path):
    """The MOSS guarantee: two documents sharing a token run of length
    >= k + w - 1 select at least one identical fingerprint hash; docs
    with no shared k-gram share none."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 = k+w-1
    d = _docs(
        spark,
        tmp_path,
        [
            f"one two three {shared} four five six",
            f"{shared} nine ten eleven twelve thirteen",
            "completely different words with no overlap at all here now",
        ],
    )
    fp = q_winnowing(spark, d).collect()
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] & by_doc[1], "shared 8-token run must share a fingerprint"
    assert not (by_doc[0] & by_doc[2])
    assert not (by_doc[1] & by_doc[2])


def test_winnowing_density_and_short_docs(spark, tmp_path):
    toks = " ".join(f"w{i}" for i in range(100))
    d = _docs(
        spark,
        tmp_path,
        [toks, "a b c", "a b c d e f"],  # 3 toks < k; 6 toks -> 3 grams < w
    )
    rows = q_winnowing(spark, d).collect()
    n = {i: 0 for i in range(3)}
    for r in rows:
        n[r["doc_id"]] += 1
    # ~2/(w+1) density: 97 grams, 93 windows -> far fewer selections
    assert 10 <= n[0] <= 60
    assert n[1] == 0  # no k-gram at all
    assert 1 <= n[2] <= 3  # single short window still selects


def test_hash_embed_is_linear_in_token_counts(spark, tmp_path):
    """vec(doc repeated twice) == 2 * vec(doc); zero doc -> zero vector."""
    base = "the quick brown fox jumps over the lazy dog"
    d = _docs(spark, tmp_path, [base, base + " " + base, ""])
    out = {r["doc_id"]: (r["vec"], r["nrm2"]) for r in
           q_hash_embed(spark, d).collect()}
    v0 = [int(x) for x in out[0][0].split(",")]
    v1 = [int(x) for x in out[1][0].split(",")]
    assert len(v0) == HE_DIM
    assert v1 == [2 * x for x in v0]
    assert out[1][1] == 4 * out[0][1]
    assert out[2] == (",".join(["0"] * HE_DIM), 0)
    assert out[0][1] == sum(x * x for x in v0)


def test_winnowing_plan_is_map_side_until_distinct(spark):
    """The selection itself must not shuffle: the only exchange in the
    plan belongs to the final distinct (plus AQE round-robin from the
    spread reader)."""
    plan = (
        q_winnowing(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # no join, no window, no sort anywhere in the selection
    for op in ("SortMergeJoin", "BroadcastHashJoin", "Window", "Sort "):
        assert op not in plan, f"unexpected {op} in winnowing plan"
