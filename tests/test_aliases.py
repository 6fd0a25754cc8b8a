"""Alias lifecycle tests: bootstrap-on-missing (S4), review queue
(§2.11), MERGE-style upsert (S7), sorted persistence (O4)."""

from pyspark.sql import functions as F

from ocr_to_csv_spark.extraction import aliases as A


def test_bootstrap_on_missing(spark, tmp_path):
    df = A.bootstrap_aliases(spark, str(tmp_path / "nope.parquet"))
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["col", "value"]


def test_merge_upsert_and_sorted_write(spark, tmp_path):
    existing = spark.createDataFrame(
        [(1, "mary jones"), (5, "coding")], "col int, value string"
    )
    confirmed = spark.createDataFrame(
        [
            (1, "NEW PERSON"),      # novel name → inserted lowercased
            (1, "mary jones"),      # already present → no dup
            (5, "Robotics"),        # novel purpose
            (2, "11:30"),           # non-dictionary column → rejected
            (1, ""),                # empty → rejected
            (1, None),              # null → rejected
        ],
        "col int, value string",
    )
    merged = A.merge_aliases(existing, confirmed)
    got = {(r["col"], r["value"]) for r in merged.collect()}
    assert got == {
        (1, "mary jones"),
        (1, "new person"),
        (5, "coding"),
        (5, "robotics"),
    }

    out = str(tmp_path / "aliases.parquet")
    A.write_aliases(merged, out)
    reloaded = spark.read.parquet(out).collect()
    assert [(r["col"], r["value"]) for r in reloaded] == sorted(got)
    # round-trip: bootstrap now loads the persisted table
    assert A.bootstrap_aliases(spark, out).count() == 4


def test_review_queue_flags_unaccepted(spark, corpus_dir):
    from ocr_to_csv_spark.extraction import pipeline

    tabs = pipeline.load_corpus(spark, corpus_dir)
    # run with an empty dictionary: every name/purpose match fails → the
    # review queue must receive them instead of the job crashing
    empty = spark.createDataFrame([], A.ALIAS_SCHEMA)
    res = pipeline.extract(spark, tabs["documents"], tabs["media"], empty)
    # with no dictionary nothing can be matched: spans still produced and
    # every unmatched name/purpose cell lands in the review queue
    assert res["spans"].count() > 0
    review = res["review"]
    assert review.count() > 0
    assert review.filter(F.col("col").isin(1, 5)).count() > 0
    assert {f.name for f in review.schema.fields} == {
        "doc_id", "offset", "media_ref", "row", "col", "text", "prob"
    }
