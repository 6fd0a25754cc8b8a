"""Batch 25: hand-computed fixtures — next-fit batch breaks (including
the oversized-document rule), per-epoch permutations, and the token
budget boundary."""

from ocr_to_csv_spark.functions.curation7 import (
    BATCH_CAP,
    N_EPOCHS,
    q_batch_pack,
    q_epoch_shuffle,
    q_token_budget,
)


def _docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _text(n_tok):
    return " ".join(f"w{i}" for i in range(n_tok))


def test_batch_pack_breaks_and_oversize_rule(spark, tmp_path):
    cap = BATCH_CAP
    sf = _docs(
        spark, tmp_path,
        [
            (1, _text(cap - 10), "en", "s1", 0),   # batch 0 (cap-10)
            (2, _text(20), "en", "s1", 0),          # overflow -> batch 1
            (3, _text(cap + 5), "en", "s1", 0),     # oversized -> batch 2 alone
            (4, _text(1), "en", "s1", 0),           # batch 3 (3 left no room)
            (5, _text(cap), "en", "s2", 0),         # other shard: batch 0
        ],
    )
    got = {r["doc_id"]: (r["batch_id"], r["batch_total"])
           for r in q_batch_pack(spark, sf).collect()}
    assert got[1] == (0, cap - 10)
    assert got[2] == (1, 20)
    assert got[3] == (2, cap + 5)
    assert got[4] == (3, 1)
    assert got[5] == (0, cap)  # shards pack independently


def test_epoch_shuffle_permutations_differ(spark, tmp_path):
    sf = _docs(
        spark, tmp_path,
        [(i, "x", "en", "s1", 1) for i in range(40)],
    )
    rows = q_epoch_shuffle(spark, sf).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], {})[r["doc_id"]] = r["pos"]
    assert set(by_epoch) == set(range(N_EPOCHS))
    for ep, order in by_epoch.items():
        assert sorted(order.values()) == list(range(40))  # a permutation
    # deterministic across runs
    rows2 = {(r["epoch"], r["doc_id"]): r["pos"]
             for r in q_epoch_shuffle(spark, sf).collect()}
    assert all(rows2[(r["epoch"], r["doc_id"])] == r["pos"] for r in rows)
    # and epochs genuinely reorder
    assert by_epoch[0] != by_epoch[1]


def test_token_budget_prefix_boundary(spark, tmp_path):
    from ocr_to_csv_spark.functions.curation7 import TOKEN_BUDGET

    # rich doc (high distinct count) first, then filler; budget cuts mid-list
    per = TOKEN_BUDGET // 3
    sf = _docs(
        spark, tmp_path,
        [
            (1, _text(per), "en", "s1", 0),         # distinct = per (highest)
            (2, _text(per - 1), "en", "s1", 0),
            (3, _text(per - 2), "en", "s1", 0),
            (4, _text(per - 3), "en", "s1", 0),     # would exceed budget
        ],
    )
    got = sorted(r["doc_id"] for r in q_token_budget(spark, sf).collect())
    # cumulative: per + (per-1) + (per-2) = 3*per - 3 <= budget;
    # adding per-3 pushes past it
    assert got == [1, 2, 3]
