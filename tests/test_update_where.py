"""SnapshotCatalog.update_where: copy-on-write UPDATE with
manifest-stats dir pruning — untouched dirs carried byte-identically,
merge-on-read deletes folded into rewritten dirs only, history
append-only."""

import pytest

from ocr_to_csv_spark.sources import SnapshotCatalog


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _clustered(cat, spark, name="t", dirs=4, per=1000):
    """dirs appends of DISJOINT sorted id ranges -> per-dir stats are
    tight, so a range predicate prunes to one dir."""
    for i in range(dirs):
        df = (
            spark.range(i * per, (i + 1) * per)
            .selectExpr("id", "id * 2 AS y")
            .coalesce(1)
            .sortWithinPartitions("id")
        )
        cat.append(df, name)
    return cat


def test_update_rewrites_only_matching_dirs(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    _clustered(cat, spark)
    sid_before = cat.current_snapshot_id("t")
    man_before = cat._load_manifest("t", sid_before)
    res = cat.update_where("t", "id", 1100, 1200, {"y": "y + 1000000"})
    assert res["dirs_rewritten"] == 1 and res["dirs_kept"] == 3
    assert res["rows_updated"] == 101
    man_after = cat._load_manifest("t", res["snapshot_id"])
    carried = set(man_before["data_dirs"]) & set(man_after["data_dirs"])
    assert len(carried) == 3, "untouched dirs must carry over identically"
    got = _rows(cat.read("t"))
    want = {
        (i, i * 2 + (1000000 if 1100 <= i <= 1200 else 0))
        for i in range(4000)
    }
    assert got == want
    # time travel: the old snapshot still shows pre-update values
    old = _rows(cat.read("t", snapshot_id=sid_before))
    assert old == {(i, i * 2) for i in range(4000)}


def test_update_noop_when_nothing_matches(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    _clustered(cat, spark, dirs=2)
    sid = cat.current_snapshot_id("t")
    res = cat.update_where("t", "id", 10**9, 2 * 10**9, {"y": "0"})
    assert res["snapshot_id"] == sid  # no empty commit
    assert res["dirs_rewritten"] == 0 and res["rows_updated"] == 0


def test_update_folds_deletes_into_rewritten_dir_only(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    _clustered(cat, spark, dirs=3)
    cat.delete_where("t", "id IN (150, 2150)", ["id"])  # one key per dir
    res = cat.update_where("t", "id", 100, 200, {"y": "-1"})
    assert res["dirs_rewritten"] == 1
    got = _rows(cat.read("t"))
    assert (150, -1) not in got and not any(r[0] == 150 for r in got)
    assert not any(r[0] == 2150 for r in got), "tombstone must still apply"
    assert (199, -1) in got and (201, 402) in got
    # rows_updated counted only visible rows (150 was deleted)
    assert res["rows_updated"] == 100


def test_update_full_table_and_bad_args(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    _clustered(cat, spark, dirs=2, per=50)
    res = cat.update_where("t", "id", None, None, {"y": "y * 10"})
    assert res["dirs_rewritten"] == 2
    assert _rows(cat.read("t")) == {(i, i * 20) for i in range(100)}
    with pytest.raises(ValueError, match="unknown columns"):
        cat.update_where("t", "id", 0, 1, {"nope": "1"})
    with pytest.raises(ValueError, match="unknown table"):
        cat.update_where("zzz", "id", 0, 1, {"y": "1"})


def test_update_partitioned_keeps_layout(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(
        spark.range(0, 200).selectExpr("id", "pmod(id, 2) AS p"),
        "t",
        partition_by=["p"],
    )
    res = cat.update_where("t", "id", 50, 59, {"id": "id + 10000"})
    assert res["rows_updated"] == 10
    got = cat.read("t")
    assert set(got.columns) == {"id", "p"}
    want = {
        ((i + 10000) if 50 <= i <= 59 else i, i % 2) for i in range(200)
    }
    assert _rows(got) == want


def test_update_breaks_incremental_read_guard(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    _clustered(cat, spark, dirs=2, per=100)
    sid = cat.current_snapshot_id("t")
    cat.update_where("t", "id", 0, 10, {"y": "0"})
    with pytest.raises(ValueError, match="not\\s+append-only"):
        cat.read_incremental("t", from_snapshot=sid)
