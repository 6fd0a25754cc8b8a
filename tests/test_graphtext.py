"""Batch 9 (functions/graphtext.py): HITS / label-propagation exactness
vs an independent Python replay, char-entropy hand values, chunk
coverage invariants, grouping-sets cross-level consistency — properties
the DuckDB oracle equality can't express."""

import math

from ocr_to_csv_spark.functions.graphtext import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    HITS_ITERS,
    LP_ROUNDS,
    q_char_entropy,
    q_chunk_overlap,
    q_grouping_sets,
    q_hits,
    q_label_prop,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, tmp_path, rows):
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in enumerate(rows)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(p)
    return str(tmp_path)


def _edges(n):
    e = []
    for d in range(n):
        if d % 3 != 0:
            e.append((d, (2 * d + 1) % n))
        if d % 2 == 0:
            e.append((d, (7 * d + 3) % n))
        if d % 6 == 1:
            e.append((d, (d + n // 2) % n))
    return e


def test_hits_matches_python_replay(spark, tmp_path):
    n = 12
    d = _docs(spark, tmp_path, [f"doc {i}" for i in range(n)])
    edges = _edges(n)
    h = {i: 1 for i in range(n)}
    a = {}
    for _ in range(HITS_ITERS):
        a = {i: 0 for i in range(n)}
        for s, t in edges:
            a[t] += h[s]
        h2 = {i: 0 for i in range(n)}
        for s, t in edges:
            h2[s] += a[t]
        h = h2
    got = {
        r["doc_id"]: (r["hub_units"], r["auth_units"])
        for r in q_hits(spark, d).collect()
    }
    assert got == {i: (h[i], a[i]) for i in range(n)}


def test_label_prop_matches_python_replay(spark, tmp_path):
    n = 12
    d = _docs(spark, tmp_path, [f"doc {i}" for i in range(n)])
    und = set()
    for s, t in _edges(n):
        und.add((s, t))
        und.add((t, s))
    for i in range(n):
        und.add((i, i))
    lbl = {i: i for i in range(n)}
    for _ in range(LP_ROUNDS):
        new = {}
        for v in range(n):
            cnt = {}
            for s, t in und:
                if s == v:
                    cnt[lbl[t]] = cnt.get(lbl[t], 0) + 1
            new[v] = min(
                cnt, key=lambda c: (-cnt[c], c)
            )  # most frequent, tie -> smaller label
        lbl = new
    got = {
        r["doc_id"]: r["community"] for r in q_label_prop(spark, d).collect()
    }
    assert got == lbl


def test_char_entropy_hand_values(spark, tmp_path):
    d = _docs(spark, tmp_path, ["aabb", "abcd", "", "zzzz"])
    rows = {r["doc_id"]: r for r in q_char_entropy(spark, d).collect()}
    assert set(rows) == {0, 1, 3}  # empty text dropped
    r0 = rows[0]
    assert (r0["n_chars"], r0["n_distinct"]) == (4, 2)
    assert r0["simpson"] == 1.0 - 8.0 / 16.0
    assert abs(r0["entropy_nats"] - round(math.log(2), 4)) < 1e-9
    r1 = rows[1]
    assert r1["simpson"] == 0.75
    assert abs(r1["entropy_nats"] - round(math.log(4), 4)) < 1e-9
    r3 = rows[3]
    assert r3["simpson"] == 0.0 and r3["entropy_nats"] == 0.0


def test_chunk_overlap_covers_every_token(spark, tmp_path):
    lens = [1, 47, 64, 65, 200]
    d = _docs(
        spark,
        tmp_path,
        [" ".join(f"t{i}_{j}" for j in range(ln)) for i, ln in enumerate(lens)],
    )
    rows = q_chunk_overlap(spark, d).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, ln in enumerate(lens):
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        want_k = 1 + max(0, -(-(ln - CHUNK_SIZE) // CHUNK_STRIDE)) if ln > CHUNK_SIZE else 1
        assert len(chunks) == want_k, (ln, len(chunks))
        covered = set()
        for c in chunks:
            assert c["start_tok"] == c["chunk_id"] * CHUNK_STRIDE + 1
            assert 1 <= c["n_toks"] <= CHUNK_SIZE
            covered.update(
                range(c["start_tok"], c["start_tok"] + c["n_toks"])
            )
        assert covered == set(range(1, ln + 1)), f"doc len {ln} not covered"


def test_chunk_overlap_identical_chunks_hash_equal(spark, tmp_path):
    text = " ".join(f"w{j}" for j in range(CHUNK_SIZE))
    d = _docs(spark, tmp_path, [text, text])
    rows = q_chunk_overlap(spark, d).collect()
    assert len(rows) == 2
    assert rows[0]["chunk_hash"] == rows[1]["chunk_hash"]


def test_grouping_sets_levels_are_consistent(spark):
    rows = q_grouping_sets(spark, SF).collect()
    fine = [r for r in rows if (r["g_rf"], r["g_ls"]) == (0, 0)]
    by_rf = {r["rf"]: r for r in rows if (r["g_rf"], r["g_ls"]) == (0, 1)}
    by_ls = {r["ls"]: r for r in rows if (r["g_rf"], r["g_ls"]) == (1, 0)}
    total = [r for r in rows if (r["g_rf"], r["g_ls"]) == (1, 1)]
    assert len(total) == 1 and total[0]["rf"] == "(all)" and total[0]["ls"] == "(all)"
    assert total[0]["n_rows"] == sum(r["n_rows"] for r in fine)
    for flag, r in by_rf.items():
        assert r["n_rows"] == sum(x["n_rows"] for x in fine if x["rf"] == flag)
    for st, r in by_ls.items():
        assert r["n_rows"] == sum(x["n_rows"] for x in fine if x["ls"] == st)
