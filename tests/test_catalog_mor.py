"""Merge-on-read equality deletes (Iceberg v2 delete-file analogue):
delete commits accumulate without touching the base; apply_deletes is
the major compaction that folds them in and drops the queue."""

from pyspark.sql import functions as F

from ocr_to_csv_spark.sources.catalog import Catalog


def _cat(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    rows = [(i, f"v{i}", i * 10) for i in range(20)]
    cat.append(
        spark.createDataFrame(rows, "k bigint, s string, x bigint"), "t"
    )
    return cat


def test_read_without_deletes_is_base(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    assert cat.read_mor("t", ["k"]).count() == 20


def test_delete_commits_accumulate(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.delete_keys(
        spark.createDataFrame([(1,), (2,)], "k bigint"), "t", ["k"]
    )
    assert sorted(
        r["k"] for r in cat.read_mor("t", ["k"]).collect()
    ) == [0] + list(range(3, 20))
    cat.delete_where("t", F.col("x") >= 180, ["k"])  # k=18,19
    got = sorted(r["k"] for r in cat.read_mor("t", ["k"]).collect())
    assert got == [0] + list(range(3, 18))
    # base table untouched on disk
    assert cat.read("t").count() == 20
    # deleting a key that's not in the base is a no-op
    cat.delete_keys(spark.createDataFrame([(99,)], "k bigint"), "t", ["k"])
    assert cat.read_mor("t", ["k"]).count() == 16


def test_apply_deletes_compacts_and_drops_queue(spark, tmp_path):
    import os

    cat = _cat(spark, tmp_path)
    cat.delete_keys(
        spark.createDataFrame([(5,), (6,)], "k bigint"), "t", ["k"]
    )
    assert cat.apply_deletes("t", ["k"])["applied"] is True
    assert not os.path.exists(cat._deletes_dir("t"))
    assert cat.read("t").count() == 18  # base rewritten
    assert cat.read_mor("t", ["k"]).count() == 18
    # idempotent when no queue remains
    assert cat.apply_deletes("t", ["k"])["applied"] is False


def test_mor_plan_broadcasts_deletes(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.delete_keys(spark.createDataFrame([(1,)], "k bigint"), "t", ["k"])
    plan = cat.read_mor("t", ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
