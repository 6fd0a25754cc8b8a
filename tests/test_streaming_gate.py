"""stream_gated_append (streaming/stream.py): write-audit-publish ingest
gate — micro-batches stage on a branch, the staged delta is DQ-audited,
passing batches fast-forward to main, failing ones divert whole to a
quarantine table; commit keys make re-delivery a no-op on both paths."""

import glob
import shutil

from ocr_to_csv_spark.sources import SnapshotCatalog
from ocr_to_csv_spark.streaming.stream import stream_gated_append

DDL = "id bigint, v double"
RULES = [
    ("null_id", "id IS NULL"),
    ("v_band", "v < 0 OR v > 100"),
]


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _stage(spark, tmp_path, src, rows, tag):
    tmp = str(tmp_path / f"stage_{tag}")
    spark.createDataFrame(rows, DDL).coalesce(1).write.parquet(tmp)
    part = glob.glob(tmp + "/part-*.parquet")[0]
    shutil.copy(part, str(src / f"{tag}.parquet"))


def _run(spark, tmp_path, ckpt, run_id="r1"):
    return stream_gated_append(
        spark, str(tmp_path / "stream"), DDL, str(tmp_path / "cat"), "t",
        str(tmp_path / ckpt), run_id, RULES, max_files_per_trigger=1,
    )


def test_gate_publishes_clean_and_quarantines_violating_batches(
    spark, tmp_path
):
    src = tmp_path / "stream"
    src.mkdir()
    _stage(spark, tmp_path, src, [(1, 10.0), (2, 20.0)], "f1")
    _stage(spark, tmp_path, src, [(3, 500.0), (9, 50.0)], "f2")  # violates
    _stage(spark, tmp_path, src, [(4, 5.0)], "f3")
    cat = SnapshotCatalog(spark, str(tmp_path / "cat"))

    stats = _run(spark, tmp_path, "ckpt1")
    assert stats == {"published": 2, "quarantined": 1, "skipped": 0}
    assert _rows(cat.read("t")) == {(1, 10.0), (2, 20.0), (4, 5.0)}
    assert _rows(cat.read("t_quarantine")) == {(3, 500.0), (9, 50.0)}
    # no staging branches left behind; audit evidence in the summary
    assert cat.branches("t") == {}
    qman = cat.history("t_quarantine")[-1]
    assert qman["summary"]["violations_v_band"] == 1
    assert qman["summary"]["violations_null_id"] == 0
    assert qman["summary"]["violation_rate"] == 0.5

    # full re-delivery (fresh checkpoint): every batch key is durable
    stats2 = _run(spark, tmp_path, "ckpt2")
    assert stats2 == {"published": 0, "quarantined": 0, "skipped": 3}
    assert cat.read("t").count() == 3
    assert cat.read("t_quarantine").count() == 2

    # new clean file on the ORIGINAL checkpoint: exactly the delta lands
    _stage(spark, tmp_path, src, [(5, 7.0)], "f4")
    stats3 = _run(spark, tmp_path, "ckpt1")
    assert stats3 == {"published": 1, "quarantined": 0, "skipped": 0}
    assert _rows(cat.read("t")) == {
        (1, 10.0), (2, 20.0), (4, 5.0), (5, 7.0),
    }


def test_gate_restages_after_crash_between_stage_and_publish(
    spark, tmp_path
):
    """A batch staged on a branch but never published (crash between the
    branch append and fast_forward) is NOT durable: on re-delivery the
    stale branch is dropped and the batch re-stages and publishes
    exactly once."""
    src = tmp_path / "stream"
    src.mkdir()
    _stage(spark, tmp_path, src, [(1, 10.0), (2, 20.0)], "f1")
    cat = SnapshotCatalog(spark, str(tmp_path / "cat"))

    # simulate the crashed predecessor: staged batch 0, no publish
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], DDL)
    cat.overwrite(df.limit(0), "t")
    cat.create_branch("t", "wap_r1_0")
    cat.append(df, "t", branch="wap_r1_0", summary={"commit_key": "r1:0"})
    assert cat.read("t").count() == 0  # nothing visible on main

    stats = _run(spark, tmp_path, "ckpt1")
    assert stats == {"published": 1, "quarantined": 0, "skipped": 0}
    assert _rows(cat.read("t")) == {(1, 10.0), (2, 20.0)}
    assert cat.branches("t") == {}
