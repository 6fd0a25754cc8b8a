"""Composition: incremental index maintenance on top of the snapshot
layer — a daily-crawl append lands in a SnapshotCatalog table, the index
job reads ONLY the delta (read_incremental) and merges it into the
stored inverted index, and the result equals a full rebuild. This is
the maintenance loop a 10^12-doc corpus actually runs: the full-rebuild
plan touches the corpus, the incremental plan touches a day."""

from pyspark.sql import functions as F

from ocr_to_csv_spark.functions.util import tokens
from ocr_to_csv_spark.sources import SnapshotCatalog

SF = "/root/testdata/sf0.001"


def _postings(df):
    """Full inverted index (token -> df + sorted posting CSV) from a
    documents DataFrame — same shape as textops.q_postings, unsliced."""
    tf = df.select(
        F.explode(tokens(F.col("text"))).alias("tok"), "doc_id"
    ).distinct()
    return tf.groupBy("tok").agg(
        F.count("*").alias("df"),
        F.sort_array(F.collect_set("doc_id")).alias("plist"),
    )


def _as_rows(df):
    return {
        r["tok"]: (r["df"], tuple(r["plist"])) for r in df.collect()
    }


def test_incremental_postings_equal_full_rebuild(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cat = SnapshotCatalog(spark, str(tmp_path))

    day1 = docs.where("doc_id % 3 != 0")
    day2 = docs.where("doc_id % 3 = 0")
    s1 = cat.append(day1, "docs")
    idx1 = _postings(cat.read("docs", snapshot_id=s1))

    s2 = cat.append(day2, "docs")
    delta = cat.read_incremental("docs", from_snapshot=s1, to_snapshot=s2)
    # the delta is exactly day2 — no rescan of day1
    assert delta.count() == day2.count()

    # merge: appended docs are NEW doc_ids, so per-token df adds and
    # posting lists concatenate (then re-sort); a full outer keyed merge
    # — one token-keyed shuffle over index-sized rows, never corpus-sized
    idx_delta = _postings(delta)
    merged = (
        idx1.withColumnRenamed("df", "df1").withColumnRenamed("plist", "p1")
        .join(
            idx_delta.withColumnRenamed("df", "df2").withColumnRenamed(
                "plist", "p2"
            ),
            "tok",
            "full_outer",
        )
        .select(
            "tok",
            (
                F.coalesce("df1", F.lit(0)) + F.coalesce("df2", F.lit(0))
            ).alias("df"),
            F.sort_array(
                F.concat(
                    F.coalesce("p1", F.array().cast("array<bigint>")),
                    F.coalesce("p2", F.array().cast("array<bigint>")),
                )
            ).alias("plist"),
        )
    )

    full = _postings(cat.read("docs", snapshot_id=s2))
    assert _as_rows(merged) == _as_rows(full)
    # sanity: the merge genuinely exercised both branches
    only_new = set(_as_rows(idx_delta)) - set(_as_rows(idx1))
    shared = set(_as_rows(idx_delta)) & set(_as_rows(idx1))
    assert shared, "some tokens must appear on both days"
