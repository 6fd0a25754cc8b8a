"""Per-file Bloom index (Puffin-style sidecar) on SnapshotCatalog:
equality probes skip files the bloom proves cannot contain the value,
post-index appends are conservatively kept, results always equal the
full-scan filter, and merge-on-read deletes still apply."""

from ocr_to_csv_spark.sources import SnapshotCatalog


def _vals(df):
    return sorted(tuple(r) for r in df.collect())


def _make_table(spark, tmp_path, n_files=8, rows_per=50):
    cat = SnapshotCatalog(spark, str(tmp_path))
    # tokens are block-local (each appears in ~1 file) but NON-monotonic
    # in id, so min/max range stats can't prune an equality probe on tok
    # — exactly the case the bloom index exists for
    rows = [
        (i, f"tok{(i // 25) * 7 % 31}") for i in range(n_files * rows_per)
    ]
    df = spark.createDataFrame(rows, "id int, tok string")
    cat.overwrite(df.repartition(1), "t")
    # sort-compact on id so tok values scatter across id-ordered files
    cat.compact("t", target_files=n_files, sort_by=["id"])
    return cat


def test_bloom_prunes_and_result_matches_full_scan(spark, tmp_path):
    cat = _make_table(spark, tmp_path)
    res = cat.build_bloom_index("t", "tok")
    assert res["files_indexed"] >= 8
    probe = "tok7"
    plan = cat.plan_files_eq("t", "tok", probe)
    assert plan["kept_files"] < plan["total_files"], plan
    got = _vals(cat.read_eq("t", "tok", probe))
    want = _vals(cat.read("t").where(f"tok = '{probe}'"))
    assert got == want and got


def test_bloom_absent_value_keeps_nothing_or_fps_only(spark, tmp_path):
    cat = _make_table(spark, tmp_path)
    cat.build_bloom_index("t", "tok")
    plan = cat.plan_files_eq("t", "tok", "definitely-not-present")
    # blooms may false-positive a file, but the read must come back empty
    assert _vals(cat.read_eq("t", "tok", "definitely-not-present")) == []
    assert plan["kept_files"] <= plan["total_files"]


def test_post_index_appends_are_conservatively_kept(spark, tmp_path):
    cat = _make_table(spark, tmp_path)
    cat.build_bloom_index("t", "tok")
    cat.append(
        spark.createDataFrame([(99999, "brandnew")], "id int, tok string"), "t"
    )
    # the new file has no bloom entry -> kept -> the row is found
    got = _vals(cat.read_eq("t", "tok", "brandnew"))
    assert got == [(99999, "brandnew")]


def test_bloom_read_applies_mor_deletes(spark, tmp_path):
    cat = _make_table(spark, tmp_path)
    cat.build_bloom_index("t", "tok")
    probe = "tok14"
    before = _vals(cat.read_eq("t", "tok", probe))
    assert before
    kill_id = before[0][0]
    cat.delete_keys(
        spark.createDataFrame([(kill_id,)], "id int"), "t", keys=["id"]
    )
    after = _vals(cat.read_eq("t", "tok", probe))
    assert after == [r for r in before if r[0] != kill_id]


def test_ndv_stats_accuracy_and_staleness(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    rows = [(i, f"g{i % 37}", None if i % 10 == 0 else i * 2) for i in range(3000)]
    cat.overwrite(
        spark.createDataFrame(rows, "id int, grp string, val int"), "t"
    )
    stats = cat.build_ndv_stats("t")
    assert stats["row_count"] == 3000
    cols = stats["columns"]
    assert cols["grp"]["nulls"] == 0 and cols["val"]["nulls"] == 300
    # HLL++ at 2% rsd: generous 10% tolerance on distinct counts
    assert abs(cols["id"]["ndv"] - 3000) <= 300
    assert abs(cols["grp"]["ndv"] - 37) <= 4
    # sidecar readable and stamped; staleness visible after a commit
    assert cat.table_stats("t")["built_at_snapshot"] == cat.current_snapshot_id("t")
    cat.append(spark.createDataFrame([(9999, "new", 1)], "id int, grp string, val int"), "t")
    assert cat.table_stats("t")["built_at_snapshot"] < cat.current_snapshot_id("t")
    assert cat.table_stats("nope") is None


def test_bloom_index_conservative_after_compaction(spark, tmp_path):
    """Compaction rewrites files, so old bloom entries orphan; the new
    files have no entries and must be conservatively kept until the
    index is rebuilt (run both as maintenance jobs)."""
    cat = _make_table(spark, tmp_path)
    cat.build_bloom_index("t", "tok")
    want = _vals(cat.read("t").where("tok = 'tok7'"))
    cat.compact("t", target_files=2)
    plan = cat.plan_files_eq("t", "tok", "tok7")
    assert plan["kept_files"] == plan["total_files"]  # no entries -> keep all
    assert _vals(cat.read_eq("t", "tok", "tok7")) == want
    cat.build_bloom_index("t", "tok")  # rebuild restores pruning info
    assert _vals(cat.read_eq("t", "tok", "tok7")) == want
