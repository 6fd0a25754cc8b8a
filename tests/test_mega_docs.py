"""Mega-document skew paths (SURVEY.md §7.3): a 1500-row HTML table and a
150-row rendered sheet must extract to golden outputs — these are the
documents the salted (doc_id, offset, row) repartition exists for."""

import os

import pandas as pd
import pytest

from ocr_to_csv_spark.datagen import gen
from ocr_to_csv_spark.extraction import pipeline


@pytest.fixture(scope="module")
def mega_corpus(tmp_path_factory):
    """Docs 95..97 (includes the d%97==96 mega-HTML doc) and 209..211
    (includes the d%211==210 mega-image doc), generated via the start
    offset so ids/golden match the full corpus exactly."""
    d = str(tmp_path_factory.mktemp("mega"))
    parts = [gen.gen_corpus(3, seed=42, start=95), gen.gen_corpus(2, seed=42, start=209)]
    for name in ("documents", "media", "aliases", "expected_spans", "expected_rows"):
        if name == "aliases":
            parts[0][name].to_parquet(os.path.join(d, f"{name}.parquet"), index=False)
        else:
            pd.concat([p[name] for p in parts], ignore_index=True).to_parquet(
                os.path.join(d, f"{name}.parquet"), index=False
            )
    return d


def test_mega_docs_match_golden(spark, mega_corpus):
    tabs = pipeline.load_corpus(spark, mega_corpus)
    res = pipeline.extract(spark, tabs["documents"], tabs["media"], tabs["aliases"])

    got = (
        res["spans"]
        .toPandas()
        .sort_values(["doc_id", "order"])
        .reset_index(drop=True)
        .fillna("")
    )
    exp = (
        pd.read_parquet(f"{mega_corpus}/expected_spans.parquet")
        .sort_values(["doc_id", "order"])
        .reset_index(drop=True)
        .fillna("")
    )
    assert len(got) > 1600  # the mega docs dominate
    pd.testing.assert_frame_equal(
        got[["doc_id", "kind", "text", "media_ref", "order"]],
        exp[["doc_id", "kind", "text", "media_ref", "order"]],
        check_dtype=False,
    )
