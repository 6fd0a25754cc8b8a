"""Iceberg v2 POSITION-delete files on SnapshotCatalog: row-address
tombstones hide exactly the matched physical rows (duplicates elsewhere
survive — the semantics equality deletes cannot express), sequence
numbers keep later appends visible, time travel still sees the rows,
compact folds the tombstones in, update_where folds them into rewrites,
and read_changes re-reads the deleted rows BY ADDRESS as full rows."""

import pytest

from ocr_to_csv_spark.sources import SnapshotCatalog


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_position_delete_hits_matched_rows_only(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    v1 = cat.overwrite(
        spark.createDataFrame(
            [(1, "keep"), (2, "kill"), (3, "keep")], "id int, v string"
        ),
        "t",
    )
    v2 = cat.delete_positions("t", "v = 'kill'")
    assert _rows(cat.read("t")) == [(1, "keep"), (3, "keep")]
    # time travel still sees the row; no data file was rewritten
    assert _rows(cat.read("t", snapshot_id=v1)) == [
        (1, "keep"), (2, "kill"), (3, "keep")
    ]
    assert cat.history("t")[-1]["operation"] == "delete"
    assert v2 == v1 + 1


def test_position_delete_spares_identical_duplicates_elsewhere(spark, tmp_path):
    """The defining difference from equality deletes: an identical row
    in a LATER append has a different physical address and survives a
    positional tombstone resolved before it existed."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(
        spark.createDataFrame([(1, "x"), (2, "y")], "id int, v string"), "t"
    )
    cat.delete_positions("t", "id = 1")
    assert _rows(cat.read("t")) == [(2, "y")]
    # re-append the SAME logical row: new file, new address -> visible
    cat.append(spark.createDataFrame([(1, "x")], "id int, v string"), "t")
    assert _rows(cat.read("t")) == [(1, "x"), (2, "y")]


def test_position_delete_stacks_with_equality_and_compact_folds(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(
        spark.createDataFrame(
            [(i, "v%d" % (i % 3)) for i in range(12)], "id int, v string"
        ),
        "t",
    )
    cat.delete_keys(
        spark.createDataFrame([(0,)], "id int"), "t", keys=["id"]
    )
    cat.delete_positions("t", "id IN (1, 2)")
    assert [r[0] for r in _rows(cat.read("t"))] == list(range(3, 12))
    cat.compact("t")
    assert [r[0] for r in _rows(cat.read("t"))] == list(range(3, 12))
    man = cat._load_manifest("t", cat.current_snapshot_id("t"))
    assert not man.get("delete_files")


def test_update_where_folds_position_deletes(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(
        spark.createDataFrame(
            [(i, 10 * i) for i in range(8)], "id int, val int"
        ),
        "t",
    )
    cat.delete_positions("t", "id = 5")
    cat.update_where("t", "id", 4, 6, {"val": "val + 1"})
    got = {r["id"]: r["val"] for r in cat.read("t").collect()}
    assert 5 not in got  # deleted row stays deleted through the rewrite
    assert got[4] == 41 and got[6] == 61 and got[3] == 30


def test_read_changes_emits_full_rows_for_position_deletes(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    v1 = cat.overwrite(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id int, v string"
        ),
        "t",
    )
    v2 = cat.delete_positions("t", "id = 2")
    ch = cat.read_changes("t", v1, v2).collect()
    assert len(ch) == 1
    r = ch[0]
    # full row content, not null-padded keys
    assert (r["id"], r["v"], r["_change_type"]) == (2, "b", "delete")
    # applying the changelog reproduces the new snapshot
    old = {(x["id"], x["v"]) for x in cat.read("t", snapshot_id=v1).collect()}
    dels = {(x["id"], x["v"]) for x in ch if x["_change_type"] == "delete"}
    new = {(x["id"], x["v"]) for x in cat.read("t", snapshot_id=v2).collect()}
    assert old - dels == new


def test_delete_positions_empty_table_raises(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    with pytest.raises(ValueError):
        cat.delete_positions("nope", "1 = 1")
