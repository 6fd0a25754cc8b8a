"""Batch 11 (functions/textmetrics.py): path ordering, readability
formula, RBO hand values, hapax arithmetic — properties the DuckDB
oracle equality can't express."""

import datetime

from ocr_to_csv_spark.functions.textmetrics import (
    RBO_D,
    RBO_W,
    q_hapax_ratio,
    q_readability,
    q_rbo_overlap,
    q_user_paths,
)


def _docs(spark, tmp_path, rows):
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in enumerate(rows)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(p)
    return str(tmp_path)


def test_user_paths_chronological_order(spark, tmp_path):
    t0 = datetime.datetime(2026, 1, 1, 8, 0, 0)
    rows = [
        # out of event_id order on purpose: ts decides first
        (9, t0, 1, "view", 0.0, "{}"),
        (2, t0 + datetime.timedelta(seconds=5), 1, "cart", 0.0, "{}"),
        (5, t0 + datetime.timedelta(seconds=9), 1, "buy", 0.0, "{}"),
        (1, t0, 2, "view", 0.0, "{}"),
        (3, t0, None, "ghost", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {r["user_id"]: r for r in q_user_paths(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2}
    assert got[1]["path"] == "view>cart>buy" and got[1]["n_events"] == 3
    assert got[2]["path"] == "view"


def test_readability_hand_values(spark, tmp_path):
    # 4 words, 2 sentences, vowel groups: 'o'(one)+'o'(two)... count below
    d = _docs(spark, tmp_path, ["one two. three four!", "zzz zz", ""])
    rows = {r["doc_id"]: r for r in q_readability(spark, d).collect()}
    assert set(rows) == {0, 1}  # empty text dropped
    r0 = rows[0]
    # one(o,e)=2 two(o)=1 three(ee)=1 four(ou)=1 -> 5 vowel groups
    assert (r0["n_words"], r0["n_sents"], r0["n_vgroups"]) == (4, 2, 5)
    want = round(206.835 - 1.015 * (4 / 2) - 84.6 * (5 / 4), 3)
    assert r0["flesch"] == want
    r1 = rows[1]  # no sentence punct -> clamped to 1; no vowels
    assert (r1["n_sents"], r1["n_vgroups"]) == (1, 0)


def test_rbo_identical_rankings_is_full_weight(spark, tmp_path):
    # Construct docs where tf-rank == pos-rank for token 'data':
    # doc i has tf = N-i of 'data' AND first position i (prefix pads).
    n = 6
    texts = []
    for i in range(n):
        pads = " ".join(f"x{j}" for j in range(i))  # first pos = i
        texts.append((pads + " " + "data " * (n - i)).strip())
    d = _docs(spark, tmp_path, texts)
    rows = {r["token"]: r for r in q_rbo_overlap(spark, d).collect()}
    r = rows["data"]
    assert r["overlap_at_d"] == n
    # identical rankings: rbo = sum_{d=1..n} w_d * (d/d) = sum(RBO_W[:n])
    want = 0.0
    for wd in RBO_W[:n]:
        want += wd
    assert r["rbo"] == want
    assert r["rbo"] < 1.0  # truncated RBO


def test_rbo_disjoint_rankings_is_zero(spark, tmp_path):
    # 'merge' docs: one group ranks top by tf with LATE positions, the
    # other single-occurrence with EARLY positions; with only 4 docs the
    # rankings reverse, overlap still counts shared members at depth.
    d = _docs(
        spark,
        tmp_path,
        [
            "a b c d merge merge merge",
            "e f g h merge merge",
            "merge x1",
            "merge y1 y2",
        ],
    )
    rows = {r["token"]: r for r in q_rbo_overlap(spark, d).collect()}
    r = rows["merge"]
    # all 4 docs appear in both top-50 lists -> full overlap at depth 4
    assert r["overlap_at_d"] == 4
    assert 0.0 < r["rbo"] <= sum(RBO_W[:4]) + 1e-12
    assert RBO_D == 50


def test_hapax_ratio_arithmetic(spark, tmp_path):
    d = _docs(
        spark,
        tmp_path,
        [
            "common unique1 unique2",  # 2 of 3 distinct are hapax
            "common shared",
            "shared other",
        ],
    )
    rows = {r["doc_id"]: r for r in q_hapax_ratio(spark, d).collect()}
    r0 = rows[0]
    assert (r0["n_distinct"], r0["n_hapax"]) == (3, 2)
    assert r0["hapax_ratio"] == 2.0 / 3.0
    # 'common' df=2, 'shared' df=2, 'other' df=1
    assert (rows[1]["n_hapax"], rows[2]["n_hapax"]) == (0, 1)
