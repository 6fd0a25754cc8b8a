"""End-to-end pipeline equality vs golden fixtures (SURVEY.md §5.2):
per-document span-sequence equality on (kind, text, media_ref, order) and
exact CSV-row equality — the north_rule invariant."""

import pandas as pd

from ocr_to_csv_spark.extraction import pipeline


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        out[c] = out[c].where(pd.notna(out[c]), "").astype(str)
    return out


def test_span_sequence_and_rows_equal_golden(spark, corpus_dir):
    tabs = pipeline.load_corpus(spark, corpus_dir)
    res = pipeline.extract(spark, tabs["documents"], tabs["media"], tabs["aliases"])

    got = _norm(
        res["spans"].toPandas().sort_values(["doc_id", "order"]).reset_index(drop=True)
    )
    exp = _norm(
        pd.read_parquet(f"{corpus_dir}/expected_spans.parquet")
        .sort_values(["doc_id", "order"])
        .reset_index(drop=True)
    )
    exp["order"] = exp["order"].astype(str)
    pd.testing.assert_frame_equal(
        got[["doc_id", "kind", "text", "media_ref", "order"]],
        exp[["doc_id", "kind", "text", "media_ref", "order"]],
    )

    rows_got = _norm(
        res["rows"].toPandas().sort_values(["doc_id", "page", "row"]).reset_index(drop=True)
    )
    rows_exp = _norm(
        pd.read_parquet(f"{corpus_dir}/expected_rows.parquet")
        .sort_values(["doc_id", "page", "row"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(rows_got, rows_exp, check_dtype=False)


def test_quarantine_empty_on_clean_corpus(spark, corpus_dir):
    tabs = pipeline.load_corpus(spark, corpus_dir)
    res = pipeline.extract(spark, tabs["documents"], tabs["media"], tabs["aliases"])
    assert res["quarantine"].count() == 0


def test_csv_strings_shape(spark, corpus_dir):
    tabs = pipeline.load_corpus(spark, corpus_dir)
    res = pipeline.extract(spark, tabs["documents"], tabs["media"], tabs["aliases"])
    csv = pipeline.to_csv_strings(res["rows"]).toPandas()
    assert (csv["csv"].str.endswith("\n\n")).all()
    # every page block is newline-joined rows of ≥5 comma fields
    some = csv.iloc[0]["csv"].strip().split("\n")
    assert all(line.count(",") >= 4 for line in some if line)
