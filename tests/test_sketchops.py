"""Batch 42: Count-Min and AMS sketches checked against an independent
pure-Python reimplementation of the hashing + sketch arithmetic (the
test mirrors ``hex32`` with hashlib directly, so a regression in the
Spark expression chain cannot cancel out)."""

import hashlib

from ocr_to_csv_spark.functions.sketchops import (
    AMS_K,
    CMS_D,
    CMS_TOPK,
    CMS_W,
    q_ams_f2,
    q_cms_freq,
)

DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _docs(spark, tmp_path, texts):
    rows = [
        (i, t, "en", f"src{i % 2}", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(rows, DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


TEXTS = [
    "alpha alpha alpha beta beta gamma",
    "alpha beta delta delta epsilon",
    "gamma gamma zeta eta theta theta theta",
    "alpha iota kappa kappa",
]


def _true_counts():
    cnt: dict[str, int] = {}
    for t in TEXTS:
        for w in t.split():
            cnt[w] = cnt.get(w, 0) + 1
    return cnt


def test_cms_freq_matches_python_sketch(spark, tmp_path):
    sf = _docs(spark, tmp_path, TEXTS)
    cnt = _true_counts()
    # python sketch
    grid = [[0] * CMS_W for _ in range(CMS_D)]
    for w, c in cnt.items():
        for j in range(CMS_D):
            grid[j][_h32(f"cms{j}|{w}") % CMS_W] += c
    topk = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_TOPK]
    expected = {
        w: (c, min(grid[j][_h32(f"cms{j}|{w}") % CMS_W] for j in range(CMS_D)))
        for w, c in topk
    }
    got = {
        r["token"]: (r["true_cnt"], r["est_cnt"])
        for r in q_cms_freq(spark, sf).collect()
    }
    assert got == expected
    # CMS invariant: never under-estimates
    assert all(est >= true for true, est in got.values())


def test_ams_f2_matches_python_sketch(spark, tmp_path):
    sf = _docs(spark, tmp_path, TEXTS)
    cnt = _true_counts()
    true_f2 = sum(c * c for c in cnt.values())
    est_sum = 0
    for j in range(AMS_K):
        s = sum(
            (1 if _h32(f"ams{j}|{w}") % 2 == 0 else -1) * c
            for w, c in cnt.items()
        )
        est_sum += s * s
    rows = q_ams_f2(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["k"], r["true_f2"], r["est_sum"]) == (AMS_K, true_f2, est_sum)
    assert r["est"] == est_sum / AMS_K
