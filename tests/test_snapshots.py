"""SnapshotCatalog (sources/snapshots.py): Iceberg-shaped snapshot log —
time travel, snapshot isolation, rollback, expiry — and bucketed
co-located joins (Catalog.write_bucketed)."""

import pytest

from ocr_to_csv_spark.sources import Catalog, SnapshotCatalog


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_time_travel_and_history(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    v1 = cat.overwrite(
        spark.createDataFrame([(1, "a")], "id int, v string"), "t"
    )
    v2 = cat.append(
        spark.createDataFrame([(2, "b")], "id int, v string"), "t"
    )
    v3 = cat.overwrite(
        spark.createDataFrame([(9, "z")], "id int, v string"), "t"
    )
    assert (v1, v2, v3) == (1, 2, 3)
    assert _rows(cat.read("t")) == {(9, "z")}
    assert _rows(cat.read("t", snapshot_id=v2)) == {(1, "a"), (2, "b")}
    assert _rows(cat.read("t", snapshot_id=v1)) == {(1, "a")}
    ops = [m["operation"] for m in cat.history("t")]
    assert ops == ["overwrite", "append", "overwrite"]
    assert [m["parent_id"] for m in cat.history("t")] == [None, 1, 2]


def test_snapshot_isolation_reader_survives_commits(spark, tmp_path):
    """A DataFrame planned against snapshot N keeps returning N's rows
    after later overwrites — the property the mutable Catalog needs a
    scratch-swap to fake."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(spark.range(0, 100).selectExpr("id", "id*2 AS y"), "t")
    old = cat.read("t")  # plan now, consume later
    cat.overwrite(spark.range(0, 5).selectExpr("id", "id AS y"), "t")
    cat.merge_upsert(
        spark.createDataFrame([(3, 99)], "id bigint, y bigint"), "t", ["id"]
    )
    assert old.count() == 100  # still the old files
    assert cat.read("t").count() == 5


def test_merge_upsert_cow_keeps_parent_readable(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    base = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "y")], "k string, v int, tag string"
    )
    v1 = cat.merge_upsert(base, "t", keys=["k"])
    upd = spark.createDataFrame([("a", 9, "x2")], "k string, v int, tag string")
    cat.merge_upsert(upd, "t", keys=["k"])
    assert {r["k"]: (r["v"], r["tag"]) for r in cat.read("t").collect()} == {
        "a": (9, "x2"),
        "b": (2, "y"),
    }
    # pre-merge state is still one time-travel away
    assert _rows(cat.read("t", snapshot_id=v1)) == {("a", 1, "x"), ("b", 2, "y")}
    # idempotent re-delivery: same logical state, new snapshot
    cat.merge_upsert(upd, "t", keys=["k"])
    assert {r["k"]: r["v"] for r in cat.read("t").collect()} == {"a": 9, "b": 2}


def test_rollback_is_append_only(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(spark.createDataFrame([(1,)], "id int"), "t")
    cat.overwrite(spark.createDataFrame([(2,)], "id int"), "t")
    v3 = cat.rollback("t", 1)
    assert v3 == 3 and _rows(cat.read("t")) == {(1,)}
    # the rolled-back-over snapshot is STILL reachable (history intact)
    assert _rows(cat.read("t", snapshot_id=2)) == {(2,)}
    assert cat.history("t")[-1]["operation"] == "rollback-to-1"


def test_expire_snapshots_gc(spark, tmp_path):
    import os

    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(spark.createDataFrame([(1,)], "id int"), "t")   # v1
    cat.append(spark.createDataFrame([(2,)], "id int"), "t")      # v2 (reuses v1 dir)
    cat.overwrite(spark.createDataFrame([(3,)], "id int"), "t")   # v3
    stats = cat.expire_snapshots("t", keep_last=1)
    assert stats == {
        "expired_snapshots": 2,
        "removed_data_dirs": 2,
        "retained_snapshots": 1,
    }
    # live data untouched; expired snapshot now errors clearly
    assert _rows(cat.read("t")) == {(3,)}
    with pytest.raises(ValueError, match="no snapshot 1"):
        cat.read("t", snapshot_id=1)
    # only the one live data dir remains on disk
    assert len(os.listdir(cat._data_dir("t"))) == 1
    # expiry never deletes dirs shared with retained snapshots
    cat.append(spark.createDataFrame([(4,)], "id int"), "t")
    cat.expire_snapshots("t", keep_last=2)  # keeps v3 and v4; v3's dir shared
    assert _rows(cat.read("t")) == {(3,), (4,)}


def test_unknown_table_and_bad_args(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    with pytest.raises(ValueError, match="unknown table"):
        cat.read("nope")
    cat.overwrite(spark.createDataFrame([(1,)], "id int"), "t")
    with pytest.raises(ValueError, match="keep_last"):
        cat.expire_snapshots("t", keep_last=0)


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the same key with the same N join with
    ZERO shuffle exchanges — the co-location contract write_bucketed
    exists for. Broadcast is disabled so the plan must be a
    SortMergeJoin; bucketing makes both exchanges (and with sortBy, the
    sorts) vanish."""
    cat = Catalog(spark, str(tmp_path))
    a = spark.range(0, 10_000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(0, 10_000).selectExpr("id AS k", "id * 3 AS vb")
    cat.write_bucketed(a, "snap_bkt_a", ["k"], n_buckets=8)
    cat.write_bucketed(b, "snap_bkt_b", ["k"], n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = cat.read_bucketed("snap_bkt_a").join(
            cat.read_bucketed("snap_bkt_b"), "k"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert j.count() == 10_000
        got = j.filter("k = 7").collect()[0]
        assert (got["va"], got["vb"]) == (14, 21)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS snap_bkt_a")
        spark.sql("DROP TABLE IF EXISTS snap_bkt_b")


def test_stream_snapshot_append_exactly_once(spark, tmp_path):
    """At-least-once foreachBatch + commit-key dedup in the snapshot
    summary = exactly-once table state: a full re-delivery (fresh
    checkpoint, same run_id) appends NOTHING; new data appends once."""
    from ocr_to_csv_spark.streaming.stream import stream_snapshot_append

    import glob
    import shutil

    src = tmp_path / "stream"
    src.mkdir()
    ddl = "id bigint, v string"

    def stage(rows, tag):
        tmp = str(tmp_path / f"stage_{tag}")
        spark.createDataFrame(rows, ddl).coalesce(1).write.parquet(tmp)
        part = glob.glob(tmp + "/part-*.parquet")[0]
        shutil.copy(part, str(src / f"{tag}.parquet"))

    stage([(1, "a"), (2, "b")], "f1")
    stage([(3, "c")], "f2")
    cat = SnapshotCatalog(spark, str(tmp_path / "cat"))

    def run(ckpt):
        stream_snapshot_append(
            spark, str(src), ddl, str(tmp_path / "cat"), "t",
            str(tmp_path / ckpt), run_id="r1", max_files_per_trigger=1,
        )

    run("ckpt1")
    assert _rows(cat.read("t")) == {(1, "a"), (2, "b"), (3, "c")}
    n_snaps = len(cat.history("t"))
    assert n_snaps >= 2  # one commit per micro-batch

    # lost checkpoint -> full re-delivery of every batch: all skipped
    run("ckpt2")
    assert _rows(cat.read("t")) == {(1, "a"), (2, "b"), (3, "c")}
    assert len(cat.history("t")) == n_snaps

    # new file, ORIGINAL checkpoint: exactly the delta lands
    stage([(4, "d")], "f3")
    run("ckpt1")
    assert _rows(cat.read("t")) == {(1, "a"), (2, "b"), (3, "c"), (4, "d")}
    assert len(cat.history("t")) == n_snaps + 1
    keys = cat.committed_summaries("t", "commit_key")
    assert all(k.startswith("r1:") for k in keys) and len(keys) == n_snaps + 1


def test_concurrent_commit_race_detected(spark, tmp_path):
    """Two writers computing the same next snapshot id: the second
    manifest write must fail loudly (the sandbox analogue of losing the
    Iceberg catalog compare-and-swap), leaving the first commit intact."""
    import json
    import os

    cat = SnapshotCatalog(spark, str(tmp_path))
    df = spark.createDataFrame([(1,)], "id int")
    cat.overwrite(df, "t")
    # a racing writer already published v2 (hint not yet repointed)
    mp = cat._manifest_path("t", 2)
    with open(mp, "w") as f:
        json.dump({"snapshot_id": 2, "parent_id": 1, "operation": "append",
                   "timestamp": 0, "data_dirs": [], "summary": {}}, f)
    with pytest.raises(RuntimeError, match="concurrent commit"):
        cat.append(df, "t")
    # loser left no metadata damage: hint still points at v1
    assert cat.current_snapshot_id("t") == 1
    os.remove(mp)
    assert cat.append(df, "t") == 2  # retry succeeds after the race


def test_read_incremental_appends_only(spark, tmp_path):
    """Incremental scan returns exactly the rows added between two
    snapshots; a non-append-only range (overwrite in between) refuses
    rather than mis-reporting rewritten rows as new."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    v1 = cat.overwrite(spark.createDataFrame([(1,)], "id int"), "t")
    v2 = cat.append(spark.createDataFrame([(2,), (3,)], "id int"), "t")
    v3 = cat.append(spark.createDataFrame([(4,)], "id int"), "t")
    assert _rows(cat.read_incremental("t", v1, v2)) == {(2,), (3,)}
    assert _rows(cat.read_incremental("t", v1)) == {(2,), (3,), (4,)}
    assert _rows(cat.read_incremental("t", v2, v3)) == {(4,)}
    # empty delta: same snapshot twice -> zero rows, correct schema
    inc = cat.read_incremental("t", v3, v3)
    assert inc.count() == 0 and inc.schema == cat.read("t").schema
    # an overwrite breaks append-only lineage: loud refusal
    v4 = cat.overwrite(spark.createDataFrame([(9,)], "id int"), "t")
    with pytest.raises(ValueError, match="not\\s+append-only"):
        cat.read_incremental("t", v1, v4)
    # but ranges on the new lineage work again
    v5 = cat.append(spark.createDataFrame([(10,)], "id int"), "t")
    assert _rows(cat.read_incremental("t", v4, v5)) == {(10,)}


def test_partitioned_snapshots_prune_and_guard_spec(spark, tmp_path):
    """Partitioned snapshot tables: appends inherit the partition spec,
    a CHANGED spec on append raises, reads prune — the partition filter
    pushes into EVERY per-dir scan of the unioned plan — and time travel
    / incremental scans keep working on the partitioned layout."""
    import re

    cat = SnapshotCatalog(spark, str(tmp_path))
    v1 = cat.overwrite(
        spark.range(0, 400).selectExpr("id", "id % 4 AS bucket"),
        "t", partition_by=["bucket"],
    )
    v2 = cat.append(spark.range(400, 600).selectExpr("id", "id % 4 AS bucket"), "t")
    assert cat.read("t").count() == 600
    assert cat.read("t", snapshot_id=v1).count() == 400
    assert _rows(cat.read_incremental("t", v1, v2).select("id")) == {
        (i,) for i in range(400, 600)
    }
    # pruning: every branch scan carries the pushed partition filter
    sel = cat.read("t").filter("bucket = 2")
    plan = sel._jdf.queryExecution().executedPlan().toString()
    pf = re.findall(r"PartitionFilters: \[[^\]]*bucket[^\]]*= 2[^\]]*\]", plan)
    assert len(pf) == 2, plan  # one pruned scan per snapshot data dir
    assert sel.count() == 150
    # spec guard: a silent spec change is refused (evolve_spec opts in)
    with pytest.raises(ValueError, match="evolve_spec"):
        cat.append(
            spark.range(0, 5).selectExpr("id", "id % 4 AS bucket"),
            "t", partition_by=["id"],
        )
    # merge + rollback carry the spec forward
    cat.merge_upsert(
        spark.createDataFrame([(7, 99)], "id bigint, bucket bigint"), "t", ["id"]
    )
    assert cat.history("t")[-1]["partition_by"] == ["bucket"]
    cat.rollback("t", v1)
    assert cat.history("t")[-1]["partition_by"] == ["bucket"]
    assert cat.read("t").count() == 400


def test_empty_partitioned_commit_reads_back_with_schema(spark, tmp_path):
    """An empty partitioned commit writes ZERO parquet files; the schema
    recorded in the manifest (Iceberg-style) makes it readable anyway,
    and later appends work normally. Null partition values round-trip
    through the hive default partition."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(
        spark.createDataFrame([], "id bigint, shard bigint"),
        "t", partition_by=["shard"],
    )
    e = cat.read("t")
    assert e.count() == 0 and set(e.columns) == {"id", "shard"}
    cat.append(spark.range(0, 20).selectExpr("id", "id % 2 AS shard"), "t")
    assert cat.read("t").count() == 20
    cat.overwrite(
        spark.createDataFrame([(1, None)], "id bigint, shard bigint"),
        "n", partition_by=["shard"],
    )
    assert _rows(cat.read("n")) == {(1, None)}


def test_schema_evolution_add_only(spark, tmp_path):
    """Add-column appends: old dirs null-fill the new column; appends may
    omit existing columns (null-filled too); time travel shows each
    snapshot's own schema; type changes raise."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    v1 = cat.overwrite(
        spark.createDataFrame([(1, "a")], "id bigint, v string"), "t"
    )
    # evolve: new column 'lang'
    v2 = cat.append(
        spark.createDataFrame([(2, "b", "en")], "id bigint, v string, lang string"),
        "t",
    )
    cur = cat.read("t")
    assert cur.columns == ["id", "v", "lang"]
    assert _rows(cur) == {(1, "a", None), (2, "b", "en")}
    # old snapshot keeps its own (pre-evolution) schema
    assert cat.read("t", snapshot_id=v1).columns == ["id", "v"]
    # append OMITTING existing columns null-fills them
    cat.append(spark.createDataFrame([(3,)], "id bigint"), "t")
    assert _rows(cat.read("t")) == {
        (1, "a", None), (2, "b", "en"), (3, None, None)
    }
    # incremental scan over evolved range aligns to the newest schema
    assert _rows(cat.read_incremental("t", v1)) == {
        (2, "b", "en"), (3, None, None)
    }
    # type change refused
    with pytest.raises(ValueError, match="type change"):
        cat.append(spark.createDataFrame([("x", "y")], "id string, v string"), "t")
    # merge_upsert with a new column evolves too
    cat.merge_upsert(
        spark.createDataFrame(
            [(1, "a2", "de", 9)], "id bigint, v string, lang string, score bigint"
        ),
        "t", keys=["id"],
    )
    got = {r["id"]: (r["v"], r["lang"], r["score"]) for r in cat.read("t").collect()}
    assert got == {1: ("a2", "de", 9), 2: ("b", "en", None), 3: (None, None, None)}


def test_compact_rewrites_small_files_as_new_snapshot(spark, tmp_path):
    """Compaction collapses the append litter into one file, preserves
    the exact row set and schema, keeps the fragmented history
    time-travel readable, and read_incremental refuses to cross the
    replace (then works again for appends on top of it)."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    base = cat.overwrite(
        spark.range(0, 10).selectExpr("id", "id * 2 AS y"), "t"
    )
    for i in range(4):  # micro-batch litter: one dir per append
        cat.append(
            spark.range(10 + i, 11 + i).selectExpr("id", "id * 2 AS y"), "t"
        )
    pre = cat.current_snapshot_id("t")
    before = _rows(cat.read("t"))
    info = cat.compact("t")
    assert info["dirs_before"] == 5
    assert info["files_before"] > info["files_after"] == 1
    assert _rows(cat.read("t")) == before
    assert cat.read("t").schema == cat.read("t", snapshot_id=pre).schema
    # history intact: pre-compaction snapshots still readable
    assert _rows(cat.read("t", snapshot_id=base)) == {
        (i, 2 * i) for i in range(10)
    }
    assert cat.history("t")[-1]["operation"] == "replace"
    # replace is not append-only: incremental across it must refuse
    with pytest.raises(ValueError, match="not.*append-only"):
        cat.read_incremental("t", from_snapshot=pre)
    # but incremental after the compaction works
    cat.append(spark.createDataFrame([(99, 198)], "id bigint, y bigint"), "t")
    delta = _rows(cat.read_incremental("t", from_snapshot=info["snapshot_id"]))
    assert delta == {(99, 198)}


def test_compact_partitioned_keeps_pruning_and_layout(spark, tmp_path):
    """Partitioned compaction collapses each hive partition dir to one
    file and the partition filter still prunes to a single dir scan."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    df = spark.range(0, 40).selectExpr("id", "cast(id % 4 as int) AS p")
    cat.overwrite(df, "t", partition_by=["p"])
    for i in range(3):
        cat.append(
            spark.range(100 + i, 101 + i).selectExpr(
                "id", "cast(id % 4 as int) AS p"
            ),
            "t",
        )
    before = _rows(cat.read("t"))
    info = cat.compact("t", target_files=4)
    assert _rows(cat.read("t")) == before
    assert cat.history("t")[-1]["partition_by"] == ["p"]
    got = _rows(cat.read("t").filter("p = 1"))
    assert got and all(r[1] == 1 for r in got)
    plan = cat.read("t").filter("p = 1")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_compact_bad_args(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    with pytest.raises(ValueError, match="unknown table"):
        cat.compact("missing")
    cat.overwrite(spark.range(3).selectExpr("id"), "t")
    with pytest.raises(ValueError, match="target_files"):
        cat.compact("t", target_files=0)


def test_compact_sort_by_restores_disjoint_file_ranges(spark, tmp_path):
    """Sort-order compaction (rewrite_data_files strategy => 'sort'):
    scrambled appends compact into files covering pairwise-disjoint key
    ranges, so min/max footer pruning works; rows unchanged."""
    import os

    import pyarrow.parquet as pq

    cat = SnapshotCatalog(spark, str(tmp_path))
    # appends arrive in key-scrambled order (hash of id), as ingest does
    full = spark.range(0, 4000).selectExpr("id", "id * 7 AS y")
    for i in range(4):
        cat.append(full.where(f"pmod(hash(id), 4) = {i}"), "t")
    before = _rows(cat.read("t"))
    info = cat.compact("t", target_files=8, sort_by=["id"])
    assert info["files_after"] >= 2  # multiple files, else vacuous
    assert _rows(cat.read("t")) == before
    man = cat.history("t")[-1]
    assert man["summary"]["sort_by"] == ["id"]
    data_root = os.path.join(str(tmp_path), "t", "data", man["data_dirs"][0])
    ranges = []
    for root, _, fs in os.walk(data_root):
        for f in fs:
            if f.endswith(".parquet"):
                md = pq.read_metadata(os.path.join(root, f))
                los, his = [], []
                for rg in range(md.num_row_groups):
                    col = md.row_group(rg).column(0)
                    los.append(col.statistics.min)
                    his.append(col.statistics.max)
                ranges.append((min(los), max(his)))
    assert len(ranges) == info["files_after"]
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2


# ---------- merge-on-read equality deletes (Iceberg v2) ----------


def test_mor_delete_hides_rows_without_rewriting_data(spark, tmp_path):
    """delete_where commits an equality-delete file: reads exclude the
    keys, the data dirs are untouched, time travel still sees them."""
    import os

    cat = SnapshotCatalog(spark, str(tmp_path))
    v1 = cat.overwrite(
        spark.range(0, 100).selectExpr("id", "id * 2 AS y"), "t"
    )
    before_dirs = sorted(os.listdir(os.path.join(str(tmp_path), "t", "data")))
    v2 = cat.delete_where("t", "id % 10 = 3", ["id"])
    assert sorted(
        os.listdir(os.path.join(str(tmp_path), "t", "data"))
    ) == before_dirs  # no data rewrite
    got = _rows(cat.read("t"))
    assert len(got) == 90 and all(r[0] % 10 != 3 for r in got)
    assert len(_rows(cat.read("t", snapshot_id=v1))) == 100  # time travel
    man = cat.history("t")[-1]
    assert man["operation"] == "delete"
    assert len(man["delete_files"]) == 1
    assert man["delete_files"][0]["seq"] == v2


def test_mor_delete_sequence_reappend_is_visible(spark, tmp_path):
    """Sequence-number semantics: a key re-appended AFTER its delete is
    visible (the delete only applies to dirs with a lower sequence)."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(
        spark.createDataFrame([(1, "old"), (2, "keep")], "id int, v string"),
        "t",
    )
    cat.delete_where("t", "id = 1", ["id"])
    assert _rows(cat.read("t")) == {(2, "keep")}
    cat.append(spark.createDataFrame([(1, "new")], "id int, v string"), "t")
    assert _rows(cat.read("t")) == {(2, "keep"), (1, "new")}


def test_mor_delete_stacking_and_compact_folds_them_in(spark, tmp_path):
    """Two stacked deletes both apply; compact applies + clears the
    delete files and the row set is unchanged by the rewrite."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(spark.range(0, 50).selectExpr("id", "id * 3 AS y"), "t")
    cat.delete_where("t", "id < 10", ["id"])
    cat.delete_keys(
        spark.createDataFrame([(40,), (41,)], "id bigint"), "t", ["id"]
    )
    want = {(i, i * 3) for i in range(10, 50) if i not in (40, 41)}
    assert _rows(cat.read("t")) == want
    info = cat.compact("t", target_files=2)
    assert _rows(cat.read("t")) == want
    man = cat.history("t")[-1]
    assert man["delete_files"] == []
    assert man["summary"]["applied_delete_files"] == 2
    assert info["files_after"] == 2


def test_mor_delete_blocks_incremental_and_gc_reclaims_tombstones(
    spark, tmp_path
):
    """read_incremental refuses to cross a delete commit (append-only
    guard); expire_snapshots GCs delete files no retained snapshot
    references."""
    import os

    cat = SnapshotCatalog(spark, str(tmp_path))
    v1 = cat.overwrite(spark.range(0, 20).selectExpr("id"), "t")
    cat.delete_where("t", "id = 0", ["id"])
    cat.append(spark.range(100, 110).selectExpr("id"), "t")
    with pytest.raises(ValueError, match="DELETE"):
        cat.read_incremental("t", v1)
    cat.compact("t")
    assert os.listdir(os.path.join(str(tmp_path), "t", "deletes"))
    cat.expire_snapshots("t", keep_last=1)
    assert not os.listdir(os.path.join(str(tmp_path), "t", "deletes"))
    assert _rows(cat.read("t")) == {(i,) for i in range(1, 20)} | {
        (i,) for i in range(100, 110)
    }


def test_mor_delete_on_partitioned_table(spark, tmp_path):
    """Deletes compose with hive-partitioned tables: partition columns
    keep pruning, deleted keys vanish from every partition branch."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(
        spark.range(0, 40).selectExpr("id", "pmod(id, 4) AS p"),
        "t",
        partition_by=["p"],
    )
    cat.delete_where("t", "id < 8", ["id"])
    got = cat.read("t").where("p = 1")
    assert _rows(got) == {(i, 1) for i in range(8, 40) if i % 4 == 1}


def test_mor_delete_bad_keys_raise(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(spark.range(3).selectExpr("id"), "t")
    with pytest.raises(ValueError, match="not in keys_df"):
        cat.delete_keys(spark.range(1).selectExpr("id AS other"), "t", ["id"])
    with pytest.raises(ValueError, match="unknown table"):
        cat.delete_where("nope", "id = 1", ["id"])


# ---------- manifest file stats + planning-time pruning ----------


def test_manifest_stats_prune_files_on_clustered_table(spark, tmp_path):
    """After a sort-order compaction the manifest's per-file min/max
    bounds let plan_files skip most files WITHOUT opening them, and
    read_where over the pruned set equals the full-scan filter."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    full = spark.range(0, 8000).selectExpr("id", "id * 7 AS y")
    for i in range(4):  # key-scrambled ingest
        cat.append(full.where(f"pmod(hash(id), 4) = {i}"), "t")
    cat.compact("t", target_files=8, sort_by=["id"])
    plan = cat.plan_files("t", "id", lo=1000, hi=1999)
    assert plan["total_files"] == 8
    # disjoint ranges -> most files skipped; repartitionByRange picks
    # boundaries by SAMPLING, so under load a 1000-id probe range can
    # straddle one extra file — allow 3, the pruning claim (8 -> few)
    # is what matters and pruning is conservative by design
    assert plan["kept_files"] <= 3
    got = _rows(cat.read_where("t", "id", lo=1000, hi=1999))
    want = _rows(cat.read("t").where("id BETWEEN 1000 AND 1999"))
    assert got == want and len(got) == 1000


def test_read_where_unclustered_is_conservative_and_correct(spark, tmp_path):
    """On unclustered data every file overlaps the range: nothing is
    pruned, the residual filter still yields exactly the right rows."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    df = spark.range(0, 1000).selectExpr(
        "pmod(hash(id), 1000) AS k", "id AS v"
    ).repartition(4)
    cat.overwrite(df, "t")
    plan = cat.plan_files("t", "k", lo=100, hi=200)
    assert plan["kept_files"] == plan["total_files"]
    got = _rows(cat.read_where("t", "k", lo=100, hi=200))
    assert got == _rows(cat.read("t").where("k BETWEEN 100 AND 200"))


def test_read_where_applies_mor_deletes(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(spark.range(0, 100).selectExpr("id", "id*2 AS y"), "t")
    cat.compact("t", target_files=4, sort_by=["id"])
    cat.delete_where("t", "id IN (10, 11)", ["id"])
    got = _rows(cat.read_where("t", "id", lo=0, hi=20))
    assert got == {(i, i * 2) for i in range(21) if i not in (10, 11)}


def test_read_where_on_partitioned_table_keeps_partition_cols(
    spark, tmp_path
):
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(
        spark.range(0, 200).selectExpr("id", "pmod(id, 2) AS p"),
        "t",
        partition_by=["p"],
    )
    got = cat.read_where("t", "id", lo=50, hi=60)
    assert set(got.columns) == {"id", "p"}
    assert _rows(got) == {(i, i % 2) for i in range(50, 61)}


def test_manifest_stats_survive_string_and_skip_complex(spark, tmp_path):
    """String bounds are recorded (utf-8 decoded); array columns are
    skipped, not crashed on; string-range read_where is exact."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    df = spark.createDataFrame(
        [("apple", [1, 2]), ("banana", [3]), ("cherry", [])],
        "name string, xs array<int>",
    )
    cat.overwrite(df.repartition(1), "t")
    man = cat.history("t")[-1]
    stats = next(iter(man["file_stats"].values()))
    fstats = next(iter(stats.values()))
    assert fstats["name"] == ["apple", "cherry"]
    assert "xs" not in fstats or fstats["xs"] is None
    assert _rows(
        cat.read_where("t", "name", lo="b", hi="c").select("name")
    ) == {("banana",)}


# ---------- named refs (tags) ----------


def test_tags_read_and_pin_through_gc(spark, tmp_path):
    """A tagged snapshot stays readable by name and survives
    expire_snapshots; untagged history is GC'd; dropping the tag
    releases it."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    v1 = cat.overwrite(spark.range(0, 5).selectExpr("id"), "t")
    cat.create_tag("t", "release-1")
    v2 = cat.overwrite(spark.range(10, 15).selectExpr("id"), "t")
    v3 = cat.overwrite(spark.range(20, 25).selectExpr("id"), "t")
    assert _rows(cat.read("t", tag="release-1")) == {(i,) for i in range(5)}
    info = cat.expire_snapshots("t", keep_last=1)
    assert info["expired_snapshots"] == 1  # only v2; v1 pinned by tag
    assert _rows(cat.read("t", tag="release-1")) == {(i,) for i in range(5)}
    assert _rows(cat.read("t")) == {(i,) for i in range(20, 25)}
    with pytest.raises(ValueError, match="no snapshot"):
        cat.read("t", snapshot_id=v2)
    cat.drop_tag("t", "release-1")
    cat.expire_snapshots("t", keep_last=1)
    with pytest.raises(ValueError, match="no snapshot"):
        cat.read("t", snapshot_id=v1)
    assert v3 == 3


def test_tag_errors(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(spark.range(3).selectExpr("id"), "t")
    cat.create_tag("t", "x")
    with pytest.raises(ValueError, match="already exists"):
        cat.create_tag("t", "x")
    with pytest.raises(ValueError, match="no tag"):
        cat.read("t", tag="y")
    with pytest.raises(ValueError, match="at most one"):
        cat.read("t", snapshot_id=1, tag="x")
    with pytest.raises(ValueError, match="no snapshot"):
        cat.create_tag("t", "z", snapshot_id=99)


# ---------- partition-spec evolution ----------


def test_spec_evolution_unpartitioned_to_partitioned(spark, tmp_path):
    """Iceberg partition-spec evolution: old dirs keep their flat
    layout, new appends use the new hive spec, reads scan each dir
    under the spec it was written with. A silent spec change still
    raises without evolve_spec=True."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(
        spark.range(0, 50).selectExpr("id", "pmod(id, 3) AS p"), "t"
    )
    with pytest.raises(ValueError, match="evolve_spec"):
        cat.append(
            spark.range(50, 60).selectExpr("id", "pmod(id, 3) AS p"),
            "t",
            partition_by=["p"],
        )
    cat.append(
        spark.range(50, 100).selectExpr("id", "pmod(id, 3) AS p"),
        "t",
        partition_by=["p"],
        evolve_spec=True,
    )
    assert _rows(cat.read("t")) == {(i, i % 3) for i in range(100)}
    # partition predicate filters correctly across BOTH layouts
    assert _rows(cat.read("t").where("p = 1")) == {
        (i, i % 3) for i in range(100) if i % 3 == 1
    }
    man = cat.history("t")[-1]
    assert man["partition_by"] == ["p"]
    assert sorted(set(tuple(v) for v in man["dir_specs"].values())) == [
        (), ("p",)
    ]


def test_spec_evolution_repartition_and_compact_unifies(spark, tmp_path):
    """Changing the partition column mid-table: reads stay correct over
    the mixed layouts; compact rewrites everything under the CURRENT
    spec and dir_specs collapses to it."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(
        spark.range(0, 30).selectExpr("id", "pmod(id, 2) AS a", "pmod(id, 3) AS b"),
        "t",
        partition_by=["a"],
    )
    cat.append(
        spark.range(30, 60).selectExpr("id", "pmod(id, 2) AS a", "pmod(id, 3) AS b"),
        "t",
        partition_by=["b"],
        evolve_spec=True,
    )
    want = {(i, i % 2, i % 3) for i in range(60)}
    assert _rows(cat.read("t")) == want
    cat.compact("t", target_files=1)
    assert _rows(cat.read("t")) == want
    man = cat.history("t")[-1]
    assert list(man["dir_specs"].values()) == [["b"]]


def test_spec_evolution_composes_with_deletes_and_read_where(
    spark, tmp_path
):
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(spark.range(0, 40).selectExpr("id", "pmod(id, 2) AS p"), "t")
    cat.append(
        spark.range(40, 80).selectExpr("id", "pmod(id, 2) AS p"),
        "t",
        partition_by=["p"],
        evolve_spec=True,
    )
    cat.delete_where("t", "id IN (5, 45)", ["id"])
    got = _rows(cat.read_where("t", "id", lo=0, hi=79))
    assert got == {(i, i % 2) for i in range(80) if i not in (5, 45)}


def test_remove_orphan_files(spark, tmp_path):
    """Dirs written but never committed (died mid-commit) are orphans:
    dry_run lists them, a real run deletes them, young dirs and every
    manifest-referenced dir survive; table content is untouched."""
    import os

    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(spark.range(0, 10).selectExpr("id"), "t")
    cat.delete_where("t", "id = 0", ["id"])
    # fake a writer that died after materializing, before committing
    spark.range(5).write.parquet(
        os.path.join(str(tmp_path), "t", "data", "deadbeef0000")
    )
    old = os.path.join(str(tmp_path), "t", "data", "deadbeef0000")
    os.utime(old, (1, 1))  # make it old enough to reclaim
    spark.range(5).write.parquet(
        os.path.join(str(tmp_path), "t", "data", "deadbeef1111")
    )  # young: still in flight, must be skipped
    info = cat.remove_orphan_files("t", dry_run=True)
    assert info["orphans_removed"] == ["deadbeef0000"]
    assert os.path.isdir(old)  # dry run deleted nothing
    info = cat.remove_orphan_files("t")
    assert info["orphans_removed"] == ["deadbeef0000"]
    assert info["skipped_young"] == 1
    assert not os.path.isdir(old)
    assert _rows(cat.read("t")) == {(i,) for i in range(1, 10)}
    with pytest.raises(ValueError, match="unknown table"):
        cat.remove_orphan_files("nope")


def test_read_changes_cdc_reproduces_target_snapshot(spark, tmp_path):
    """Changelog read: inserts + MoR delete tombstones between two
    snapshots, ordered by _change_ordinal; applying them to the old
    snapshot reproduces the new one exactly (including a key deleted
    then re-appended inside the window)."""
    from pyspark.sql import functions as F

    cat = SnapshotCatalog(spark, str(tmp_path))
    v1 = cat.overwrite(
        spark.range(0, 20).selectExpr("id", "id * 2 AS y"), "t"
    )
    cat.append(spark.range(20, 30).selectExpr("id", "id * 2 AS y"), "t")
    cat.delete_where("t", "id < 5", ["id"])
    cat.append(
        spark.range(0, 3).selectExpr("id", "id * 100 AS y"), "t"
    )  # re-add deleted keys with NEW values
    v4 = cat.current_snapshot_id("t")

    ch = cat.read_changes("t", v1)
    assert set(ch.columns) == {"id", "y", "_change_type", "_change_ordinal"}
    by_type = {
        r["_change_type"]: r["n"]
        for r in ch.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    assert by_type == {"insert": 13, "delete": 5}
    # delete rows: key present, other columns null
    assert {r["id"] for r in ch.where("_change_type = 'delete'").collect()} == set(range(5))
    assert all(
        r["y"] is None for r in ch.where("_change_type = 'delete'").collect()
    )

    # apply the changelog in ordinal order -> exactly the new snapshot
    state = {tuple(r) for r in cat.read("t", snapshot_id=v1).collect()}
    for ordinal in sorted(
        r["_change_ordinal"]
        for r in ch.select("_change_ordinal").distinct().collect()
    ):
        batch = ch.where(f"_change_ordinal = {ordinal}").collect()
        for r in batch:
            if r["_change_type"] == "delete":
                state = {s for s in state if s[0] != r["id"]}
            else:
                state.add((r["id"], r["y"]))
    assert state == _rows(cat.read("t", snapshot_id=v4))


def test_read_changes_refuses_rewrites(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    v1 = cat.overwrite(spark.range(5).selectExpr("id"), "t")
    cat.delete_where("t", "id = 0", ["id"])
    cat.compact("t")
    with pytest.raises(ValueError, match="not derivable"):
        cat.read_changes("t", v1)
    v_now = cat.current_snapshot_id("t")
    # empty window is fine and returns an empty changelog with schema
    ch = cat.read_changes("t", v_now)
    assert ch.count() == 0
    assert "_change_type" in ch.columns


# ---------- branches + write-audit-publish ----------


def test_wap_branch_stage_audit_publish(spark, tmp_path):
    """The WAP loop: stage an append on a branch (main unaffected),
    audit the branch read, fast_forward to publish — main then shows
    the staged rows and the lineage is one linear chain."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    v1 = cat.overwrite(
        spark.createDataFrame([(1, "a")], "id int, v string"), "t"
    )
    cat.create_branch("t", "audit")
    v2 = cat.append(
        spark.createDataFrame([(2, "b")], "id int, v string"),
        "t", branch="audit",
    )
    # staged commit is invisible on main, visible on the branch
    assert _rows(cat.read("t")) == {(1, "a")}
    assert _rows(cat.read("t", branch="audit")) == {(1, "a"), (2, "b")}
    assert cat.current_snapshot_id("t") == v1
    assert cat.branches("t") == {"audit": v2}
    # audit passes -> publish
    assert cat.fast_forward("t", "audit") == v2
    assert cat.current_snapshot_id("t") == v2
    assert _rows(cat.read("t")) == {(1, "a"), (2, "b")}
    # published snapshot's parent is old main: linear history
    assert cat._load_manifest("t", v2)["parent_id"] == v1
    assert cat._load_manifest("t", v2)["ref"] == "audit"
    # idempotent publish
    assert cat.fast_forward("t", "audit") == v2


def test_wap_branch_stacks_commits_and_snapshot_ids_stay_unique(
    spark, tmp_path
):
    """Several staged commits advance only the branch; a later main
    commit takes a FRESH snapshot id (no collision with branch ids)."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(spark.range(3).selectExpr("id"), "t")  # v1
    cat.create_branch("t", "wap")
    cat.append(spark.range(3, 6).selectExpr("id"), "t", branch="wap")  # v2
    b2 = cat.append(
        spark.range(6, 9).selectExpr("id"), "t", branch="wap"
    )  # v3
    assert b2 == 3
    assert _rows(cat.read("t", branch="wap")) == {(i,) for i in range(9)}
    assert cat.read("t").count() == 3
    # main commits after the branch advanced: unique id, diverged lineage
    m = cat.append(spark.range(100, 101).selectExpr("id"), "t")
    assert m == 4
    assert cat._load_manifest("t", m)["parent_id"] == 1
    # diverged -> publish refuses instead of dropping main's commit
    with pytest.raises(ValueError, match="diverged"):
        cat.fast_forward("t", "wap")


def test_branch_overwrite_and_expire_pins_branch_head(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(spark.range(5).selectExpr("id"), "t")  # v1
    cat.create_branch("t", "exp")
    cat.overwrite(
        spark.range(50, 53).selectExpr("id"), "t", branch="exp"
    )  # v2 on branch
    cat.overwrite(spark.range(10, 12).selectExpr("id"), "t")  # v3 main
    info = cat.expire_snapshots("t", keep_last=1)
    # v1 expired; v2 pinned by branch head, v3 pinned as main head
    assert info["expired_snapshots"] == 1
    assert _rows(cat.read("t", branch="exp")) == {(i,) for i in range(50, 53)}
    assert _rows(cat.read("t")) == {(10,), (11,)}
    cat.drop_branch("t", "exp")
    cat.expire_snapshots("t", keep_last=1)
    with pytest.raises(ValueError, match="no snapshot"):
        cat.read("t", snapshot_id=2)


def test_branch_errors(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(spark.range(3).selectExpr("id"), "t")
    cat.create_branch("t", "b")
    with pytest.raises(ValueError, match="already exists"):
        cat.create_branch("t", "b")
    with pytest.raises(ValueError, match="'main' is the table"):
        cat.create_branch("t", "main")
    cat.create_tag("t", "r1")
    with pytest.raises(ValueError, match="names a tag"):
        cat.create_branch("t", "r1")
    with pytest.raises(ValueError, match="no branch"):
        cat.read("t", branch="nope")
    with pytest.raises(ValueError, match="no branch"):
        cat.drop_branch("t", "nope")
    with pytest.raises(ValueError, match="at most one"):
        cat.read("t", tag="r1", branch="b")


# ---------- metadata tables ----------


def test_inspect_metadata_tables(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(
        spark.createDataFrame(
            [(1, "en"), (2, "de"), (3, "en")], "id int, lang string"
        ),
        "t", partition_by=["lang"],
    )
    cat.append(
        spark.createDataFrame([(4, "fr")], "id int, lang string"), "t"
    )
    cat.create_tag("t", "rel")
    cat.create_branch("t", "wap")

    snaps = cat.inspect("t", "snapshots")
    assert [r["operation"] for r in snaps.orderBy("snapshot_id").collect()] \
        == ["overwrite", "append"]
    assert snaps.filter("ref = 'main'").count() == 2

    files = cat.inspect("t", "files")
    assert files.count() >= 2  # at least one file per commit
    assert set(files.columns) == {
        "data_dir", "file_path", "sequence_number", "spec", "bounds_json",
    }
    # every file of the partitioned table carries the spec
    assert all(r["spec"] == ["lang"] for r in files.collect())

    refs = cat.inspect("t", "refs")
    got = {(r["ref_name"], r["ref_type"]) for r in refs.collect()}
    assert got == {("main", "branch"), ("rel", "tag"), ("wap", "branch")}

    parts = cat.inspect("t", "partitions")
    langs = {r["partition"] for r in parts.collect()}
    assert langs == {"lang=en", "lang=de", "lang=fr"}
    # joinable like any table: small-file report per partition
    rep = parts.groupBy("partition").sum("n_files")
    assert rep.count() == 3

    with pytest.raises(ValueError, match="unknown metadata table"):
        cat.inspect("t", "wat")
    with pytest.raises(ValueError, match="unknown table"):
        cat.inspect("nope", "snapshots")


# ---------------- id-based schema evolution (rename / promote) ----------------


def test_rename_column_roundtrip_across_dirs(spark, tmp_path):
    """Rename is metadata-only: old dirs keep their physical name and
    resolve by field id; time travel to a pre-rename snapshot shows the
    era's schema."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    v1 = cat.overwrite(
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string"), "t"
    )
    v2 = cat.rename_column("t", "v", "val")
    # old dir readable under the NEW name
    assert cat.read("t").columns == ["id", "val"]
    assert _rows(cat.read("t")) == {(1, "a"), (2, "b")}
    # append under the new name: two dirs, two physical layouts
    cat.append(spark.createDataFrame([(3, "c")], "id int, val string"), "t")
    assert _rows(cat.read("t")) == {(1, "a"), (2, "b"), (3, "c")}
    # time travel: pre-rename snapshot shows the old column name
    assert cat.read("t", snapshot_id=v1).columns == ["id", "v"]
    assert cat.read("t", snapshot_id=v2).columns == ["id", "val"]
    # no data dir was rewritten by the rename
    m1 = cat._load_manifest("t", v1)
    m2 = cat._load_manifest("t", v2)
    assert m1["data_dirs"] == m2["data_dirs"]


def test_rename_then_filter_and_pruning_stats(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(
        spark.range(0, 100).selectExpr("id", "id * 2 AS y"), "t"
    )
    cat.rename_column("t", "y", "score")
    got = cat.read("t").where("score >= 190")
    assert _rows(got) == {(95, 190), (96, 192), (97, 194), (98, 196),
                          (99, 198)}
    # file_stats were re-keyed: range pruning still plans under new name
    out = cat.read_where("t", "score", 190, 400)
    assert out.count() == 5


def test_rename_refuses_partition_and_delete_key_columns(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(
        spark.createDataFrame(
            [(1, "x", "p1"), (2, "y", "p2")], "id int, v string, part string"
        ),
        "t",
        partition_by=["part"],
    )
    with pytest.raises(ValueError, match="partition column"):
        cat.rename_column("t", "part", "bucket")
    cat.delete_keys(
        spark.createDataFrame([(1,)], "id int"), "t", ["id"]
    )
    with pytest.raises(ValueError, match="equality .*delete|delete keys"):
        cat.rename_column("t", "id", "doc_id")
    with pytest.raises(ValueError, match="no column"):
        cat.rename_column("t", "nope", "x")
    with pytest.raises(ValueError, match="already has"):
        cat.rename_column("t", "v", "id")


def test_promote_int_to_long_across_dirs(spark, tmp_path):
    """Promotion is metadata-only; old int dirs up-cast on read; new
    appends land as bigint; sums stay exact."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(
        spark.createDataFrame([(1, 10), (2, 20)], "id int, n int"), "t"
    )
    cat.promote_column("t", "n", "bigint")
    df = cat.read("t")
    assert dict(df.dtypes)["n"] == "bigint"
    cat.append(
        spark.createDataFrame([(3, 2**40)], "id int, n bigint"), "t"
    )
    assert _rows(cat.read("t")) == {(1, 10), (2, 20), (3, 2**40)}
    with pytest.raises(ValueError, match="not supported"):
        cat.promote_column("t", "id", "double")


def test_append_wider_promotes_append_narrower_refused(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(spark.createDataFrame([(1, 1.5)], "id int, x float"), "t")
    # widening append promotes the table schema in place
    cat.append(spark.createDataFrame([(2, 2.5)], "id int, x double"), "t")
    assert dict(cat.read("t").dtypes)["x"] == "double"
    assert _rows(cat.read("t")) == {(1, 1.5), (2, 2.5)}
    # narrowing append is refused with a clear message
    import re

    with pytest.raises(ValueError, match=re.escape("narrows")):
        cat.append(
            spark.createDataFrame([(3, 3.5)], "id int, x float"), "t"
        )


def test_rename_compact_resets_per_dir_resolution(spark, tmp_path):
    """After compaction rewrites every dir under the current schema the
    manifest drops back to the fast shared-scan path."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(spark.createDataFrame([(1, "a")], "id int, v string"), "t")
    cat.append(spark.createDataFrame([(2, "b")], "id int, v string"), "t")
    cat.rename_column("t", "v", "val")
    assert cat._load_manifest("t", cat.current_snapshot_id("t"))[
        "ids_evolved"
    ]
    cat.compact("t", target_files=1)
    man = cat._load_manifest("t", cat.current_snapshot_id("t"))
    assert not man["ids_evolved"]
    assert _rows(cat.read("t")) == {(1, "a"), (2, "b")}
    assert cat.read("t").columns == ["id", "val"]


def test_rename_incremental_and_changes_resolve(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    v1 = cat.overwrite(
        spark.createDataFrame([(1, "a")], "id int, v string"), "t"
    )
    cat.rename_column("t", "v", "val")
    v3 = cat.append(
        spark.createDataFrame([(2, "b")], "id int, val string"), "t"
    )
    inc = cat.read_incremental("t", v1, v3)
    assert _rows(inc) == {(2, "b")}
    assert "val" in inc.columns
    ch = cat.read_changes("t", v1, v3)
    got = {(r["id"], r["val"], r["_change_type"]) for r in ch.collect()}
    assert got == {(2, "b", "insert")}


# ------------- id-based schema evolution, round 5: drop / re-add -------------


def test_drop_column_metadata_only(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    v1 = cat.overwrite(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "id int, v string, x int"
        ),
        "t",
    )
    v2 = cat.drop_column("t", "x")
    assert cat.read("t").columns == ["id", "v"]
    assert _rows(cat.read("t")) == {(1, "a"), (2, "b")}
    # time travel: pre-drop snapshot still shows the column with values
    assert cat.read("t", snapshot_id=v1).columns == ["id", "v", "x"]
    assert _rows(cat.read("t", snapshot_id=v1)) == {(1, "a", 10), (2, "b", 20)}
    # no data dir was rewritten
    m1, m2 = cat._load_manifest("t", v1), cat._load_manifest("t", v2)
    assert m1["data_dirs"] == m2["data_dirs"]


def test_drop_then_readd_gets_fresh_id_old_data_invisible(spark, tmp_path):
    """Iceberg last-column-id semantics: a re-added same-name column
    carries a FRESH field id, so pre-drop physical data stays NULL."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    v1 = cat.overwrite(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "id int, v string, x int"
        ),
        "t",
    )
    old_id = next(
        f["id"] for f in cat._load_manifest("t", v1)["fields"]
        if f["name"] == "x"
    )
    cat.drop_column("t", "x")
    cat.append(
        spark.createDataFrame([(3, "c", 30)], "id int, v string, x int"), "t"
    )
    man = cat._load_manifest("t", cat.current_snapshot_id("t"))
    new_id = next(f["id"] for f in man["fields"] if f["name"] == "x")
    assert new_id != old_id  # retired id is never reused
    assert man["last_column_id"] == new_id
    # old rows: x is NULL (old physical column invisible); new row: 30
    got = {(r["id"], r["v"], r["x"]) for r in cat.read("t").collect()}
    assert got == {(1, "a", None), (2, "b", None), (3, "c", 30)}
    # pre-drop time travel still shows the original values
    assert _rows(cat.read("t", snapshot_id=v1)) == {
        (1, "a", 10), (2, "b", 20)
    }


def test_drop_column_refusals(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(
        spark.createDataFrame(
            [(1, "x", "p1"), (2, "y", "p2")], "id int, v string, part string"
        ),
        "t",
        partition_by=["part"],
    )
    with pytest.raises(ValueError, match="partition column"):
        cat.drop_column("t", "part")
    with pytest.raises(ValueError, match="no column"):
        cat.drop_column("t", "nope")
    cat.delete_keys(spark.createDataFrame([(1,)], "id int"), "t", ["id"])
    with pytest.raises(ValueError, match="delete keys"):
        cat.drop_column("t", "id")
    cat2 = SnapshotCatalog(spark, str(tmp_path / "c2"))
    cat2.overwrite(spark.createDataFrame([(1,)], "id int"), "u")
    with pytest.raises(ValueError, match="last remaining"):
        cat2.drop_column("u", "id")


def test_drop_refused_for_historical_spec_column(spark, tmp_path):
    """Partition-spec evolution leaves old dirs hive-encoded under the
    old spec: a column in ANY live dir's spec cannot be dropped or
    renamed even after the current spec stops using it."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(
        spark.createDataFrame(
            [(1, "a", "p1")], "id int, v string, part string"
        ),
        "t",
        partition_by=["part"],
    )
    cat.append(
        spark.createDataFrame([(2, "b", "p2")], "id int, v string, part string"),
        "t",
        partition_by=[],
        evolve_spec=True,
    )
    man = cat._load_manifest("t", cat.current_snapshot_id("t"))
    assert man["partition_by"] == []  # current spec no longer uses part
    with pytest.raises(ValueError, match="partition column"):
        cat.drop_column("t", "part")
    with pytest.raises(ValueError, match="partition column"):
        cat.rename_column("t", "part", "bucket")


def test_rename_rekeys_bloom_index_and_ndv_stats(spark, tmp_path):
    """The bloom sidecar hashes values only, so a rename re-keys it in
    place — equality pruning keeps working under the new name with no
    rebuild; NDV stats re-key the same way."""
    import os

    cat = SnapshotCatalog(spark, str(tmp_path))
    for lo in (0, 40, 80):
        cat.append(
            spark.range(lo, lo + 40).selectExpr(
                "id", "CAST(id AS STRING) AS v"
            ),
            "t",
        )
    cat.build_bloom_index("t", "v")
    cat.build_ndv_stats("t")
    before = cat.plan_files_eq("t", "v", "7")
    assert before["kept_files"] < before["total_files"]
    cat.rename_column("t", "v", "val")
    assert not os.path.exists(cat._bloom_path("t", "v"))
    after = cat.plan_files_eq("t", "val", "7")
    assert after["kept_files"] == before["kept_files"]
    assert after["total_files"] == before["total_files"]
    import json as _json

    with open(cat._bloom_path("t", "val")) as fh:
        assert _json.load(fh)["col"] == "val"
    stats = cat.table_stats("t")
    assert "val" in stats["columns"] and "v" not in stats["columns"]
    # the pruned read still returns the right row under the new name
    assert _rows(cat.read_eq("t", "val", "7")) == {(7, "7")}


def test_drop_column_drops_bloom_and_ndv_entries(spark, tmp_path):
    import os

    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(
        spark.createDataFrame([(1, "a", 5)], "id int, v string, x int"), "t"
    )
    cat.build_bloom_index("t", "x")
    cat.build_ndv_stats("t")
    cat.drop_column("t", "x")
    assert not os.path.exists(cat._bloom_path("t", "x"))
    assert "x" not in cat.table_stats("t")["columns"]


def test_drop_readd_then_compact_returns_to_fast_path(spark, tmp_path):
    """After compaction rewrites every dir under the current schema the
    manifest drops back to the fast shared-scan path, with the re-added
    column's data intact and old data still invisible."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.overwrite(
        spark.createDataFrame([(1, "a", 10)], "id int, v string, x int"), "t"
    )
    cat.drop_column("t", "x")
    cat.append(
        spark.createDataFrame([(2, "b", 20)], "id int, v string, x int"), "t"
    )
    assert cat._load_manifest("t", cat.current_snapshot_id("t"))[
        "ids_evolved"
    ]
    cat.compact("t", target_files=1)
    man = cat._load_manifest("t", cat.current_snapshot_id("t"))
    assert not man["ids_evolved"]
    got = {(r["id"], r["v"], r["x"]) for r in cat.read("t").collect()}
    assert got == {(1, "a", None), (2, "b", 20)}


def test_drop_readd_incremental_read_resolves(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    v1 = cat.overwrite(
        spark.createDataFrame([(1, "a", 10)], "id int, v string, x int"), "t"
    )
    cat.drop_column("t", "x")
    v3 = cat.append(
        spark.createDataFrame([(2, "b", 20)], "id int, v string, x int"), "t"
    )
    inc = cat.read_incremental("t", v1, v3)
    got = {(r["id"], r["v"], r["x"]) for r in inc.collect()}
    assert got == {(2, "b", 20)}
