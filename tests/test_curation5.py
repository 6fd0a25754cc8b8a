"""Semantic properties of the curation batch-5 operators (oracle parity
is covered by tools/check_queries.py; these pin behaviours the oracles
can't express)."""

from pyspark.sql import functions as F

from ocr_to_csv_spark.functions import curation5
from ocr_to_csv_spark.functions.util import table, tokens

SF = "/root/testdata/sf0.001"


def _line_split(text: str) -> list[str]:
    toks = [t for t in text.split() if t]
    k = curation5.LINE_TOKENS
    return [" ".join(toks[i : i + k]) for i in range(0, len(toks), k)]


def test_line_dedup_strips_exactly_the_boilerplate_set(spark):
    """Recompute the df>=MIN_LINE_DF boilerplate set driver-side from the
    raw table; every clean_text must contain no boilerplate line, keep
    every non-boilerplate line in original order, and the counts must
    reconcile (n_lines - n_removed == lines surviving)."""
    raw = {
        r["doc_id"]: r["text"]
        for r in table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    df_count: dict[str, set] = {}
    for doc_id, text in raw.items():
        for ln in _line_split(text):
            df_count.setdefault(ln, set()).add(doc_id)
    boiler = {
        ln for ln, docs in df_count.items()
        if len(docs) >= curation5.MIN_LINE_DF
    }
    assert boiler, "corpus must plant repeated lines for this test to bite"

    out = {r["doc_id"]: r for r in curation5.q_line_dedup(spark, SF).collect()}
    assert set(out) == set(raw)
    for doc_id, text in raw.items():
        lines = _line_split(text)
        expect_kept = [ln for ln in lines if ln not in boiler]
        r = out[doc_id]
        assert r["n_lines"] == len(lines)
        assert r["n_removed"] == len(lines) - len(expect_kept)
        assert r["clean_text"] == " ".join(expect_kept)


def test_line_dedup_untouched_docs_roundtrip(spark):
    """A document with n_removed == 0 reproduces its whitespace-normalized
    text exactly — the filter is a no-op outside the boilerplate set."""
    out = curation5.q_line_dedup(spark, SF)
    d = table(spark, SF, "documents").select("doc_id", "text")
    joined = out.where(F.col("n_removed") == 0).join(d, "doc_id").collect()
    assert joined
    for r in joined:
        assert r["clean_text"] == " ".join(r["text"].split())


def test_pack_sequences_offsets_are_a_contiguous_stream_per_shard(spark):
    """Within each source shard (doc_id order) the offsets tile the
    token stream with no gaps or overlaps, and the sequence-id range is
    exactly the SEQ_LEN-grid cells the document's interval touches."""
    rows = curation5.q_pack_sequences(spark, SF).collect()
    assert rows
    seq = curation5.SEQ_LEN
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rs:
            assert r["start_off"] == off, (src, r["doc_id"])
            assert r["n_tokens"] > 0
            end = off + r["n_tokens"]
            assert r["seq_first"] == off // seq
            assert r["seq_last"] == (end - 1) // seq
            assert r["n_seqs"] == r["seq_last"] - r["seq_first"] + 1
            off = end


def test_pack_sequences_token_counts_match_tokenizer(spark):
    """n_tokens equals the shared whitespace tokenizer's count for every
    document (packing and token accounting cannot drift apart)."""
    d = table(spark, SF, "documents").select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("expect")
    )
    out = curation5.q_pack_sequences(spark, SF).join(d, "doc_id")
    bad = out.where(F.col("n_tokens") != F.col("expect")).count()
    assert bad == 0
