"""Batch 48: ingest-edge quarantine contracts — CSV PERMISSIVE
semantics (pinned by probe: extra column / missing column / bad cast
are malformed, quoted delimiters are not) and gzip-compressed JSONL
(Spark decompresses by extension; the quarantine split is unchanged)."""

import gzip

from ocr_to_csv_spark.sources.csv_ingest import (
    ingest_csv,
    read_csv_quarantine,
)
from ocr_to_csv_spark.sources.jsonl import read_jsonl_quarantine

CSV_SCHEMA = "id bigint, name string, score double, flag boolean"


def _csv_file(tmp_path):
    p = tmp_path / "f.csv"
    p.write_text(
        "1,alpha,1.5,true\n"
        '2,"beta,comma",2.5,false\n'
        "3,gamma,3.5,true,EXTRA\n"
        "x,delta,4.5,true\n"
        "5,epsilon,notnum,false\n"
        "6,zeta,6.5\n"
    )
    return str(p)


def test_csv_quarantine_semantics(spark, tmp_path):
    good, bad = read_csv_quarantine(spark, _csv_file(tmp_path), CSV_SCHEMA)
    g = {r["id"]: r for r in good.collect()}
    assert set(g) == {1, 2}
    assert g[2]["name"] == "beta,comma"  # quoted delimiter is NOT malformed
    lines = sorted(r["raw_line"] for r in bad.collect())
    assert lines == [
        "3,gamma,3.5,true,EXTRA",
        "5,epsilon,notnum,false",
        "6,zeta,6.5",
        "x,delta,4.5,true",
    ]


def test_ingest_csv_writes_both_sides(spark, tmp_path):
    n_good, n_bad = ingest_csv(
        spark, _csv_file(tmp_path), CSV_SCHEMA,
        str(tmp_path / "good"), str(tmp_path / "quar"),
    )
    assert (n_good, n_bad) == (2, 4)


def test_jsonl_gzip_roundtrip(spark, tmp_path):
    p = tmp_path / "f.jsonl.gz"
    lines = (
        '{"doc_id": 1, "text": "a"}\n'
        '{"doc_id": 2, "text": "b"}\n'
        "{broken\n"
    )
    with gzip.open(p, "wt") as f:
        f.write(lines)
    good, bad = read_jsonl_quarantine(
        spark, str(p), "doc_id bigint, text string"
    )
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    assert [r["raw_line"] for r in bad.collect()] == ["{broken"]
