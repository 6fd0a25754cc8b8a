"""Batch 78: Aho–Corasick multi-pattern scan + URL prefix rules."""

SF = "/root/testdata/sf0.001"


def test_ac_hand_fixture():
    """Automaton sanity on a hand-computed string, including nested
    and overlapping-position patterns."""
    from ocr_to_csv_spark.functions.scanops import _ac_scan, _build_ac

    pats = ["he", "she", "his", "hers"]
    goto, fail, exits = _build_ac(pats)
    hits = _ac_scan("ushers", goto, fail, exits)
    # 'ushers': she@1-3, he@2-3, hers@2-5
    assert {pats[p]: n for p, n in hits.items()} == {
        "she": 1, "he": 1, "hers": 1
    }


def test_ac_counts_all_occurrences():
    """AC counts overlapping occurrences (periodic pattern), which is
    why PATTERNS must stay border-free for the replace-trick oracle."""
    from ocr_to_csv_spark.functions.scanops import _ac_scan, _build_ac

    goto, fail, exits = _build_ac(["aba"])
    assert _ac_scan("ababa", goto, fail, exits) == {0: 2}


def test_patterns_are_border_free():
    """No PATTERNS entry has a border (proper prefix == proper suffix),
    so its overlapping count equals the oracle's non-overlapping
    replace-trick count."""
    from ocr_to_csv_spark.functions.scanops import PATTERNS

    for p in PATTERNS:
        for blen in range(1, len(p)):
            assert p[:blen] != p[-blen:], (p, blen)


def test_scan_matches_python_count(spark):
    """Spark AC scan equals a per-doc str.count mirror (non-overlapping
    == overlapping for border-free patterns)."""
    import glob

    import pandas as pd

    from ocr_to_csv_spark.functions.scanops import (
        PATTERNS,
        q_multi_pattern_scan,
    )

    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    docs = pd.concat(pd.read_parquet(f, columns=["doc_id", "text"]) for f in files)
    want = {}
    for _, row in docs.iterrows():
        for p in PATTERNS:
            n = (row.text or "").count(p)
            if n:
                want[(int(row.doc_id), p)] = n
    got = {
        (r.doc_id, r.pattern): r.hits
        for r in q_multi_pattern_scan(spark, SF).collect()
    }
    assert got == want
    assert any(p == "value" for _, p in got), "nested pattern must fire"
    assert not any(p == "zebra quantum" for _, p in got)


def test_prefix_match_semantics(spark):
    """Every doc gets the deepest segment-aligned rule; depth-mismatch
    paths (s1=c, or s1=b with s2=x) are absent."""
    from ocr_to_csv_spark.functions.scanops import q_url_prefix_match

    rows = {r.doc_id: (r.path, r.rule_id)
            for r in q_url_prefix_match(spark, SF).collect()}
    assert rows, "some docs must match"
    for doc_id, (path, rule) in rows.items():
        s1, s2, s3 = path[1:].split("/")
        if s1 == "a" and s2 == "x" and s3 == "1":
            assert rule == 3
        elif s1 == "a" and s2 == "x":
            assert rule == 2
        elif s1 == "a":
            assert rule == 1
        elif s1 == "b" and s2 == "y":
            assert rule == 4
        else:
            raise AssertionError(f"{path} should not have matched")
