"""Batch 96: table-maintenance planning — compaction binPack plan and
footer-stats pruning audit, each checked against an independent pure-
Python recomputation from the raw parquet."""

import glob
import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _load(tbl, cols):
    files = sorted(glob.glob(f"{SF}/{tbl}.parquet")) or sorted(
        glob.glob(f"{SF}/{tbl}.parquet/*.parquet")
    )
    return pd.concat(pd.read_parquet(f, columns=cols) for f in files)


def _manifest_py():
    from ocr_to_csv_spark.functions.tableops import ROW_OVERHEAD

    o = _load("orders", ["o_orderdate", "o_orderstatus", "o_orderpriority"])
    rows = {}
    for _, r in o.iterrows():
        fid = pd.Timestamp(r.o_orderdate).to_period("M").to_timestamp()
        n, b, lo, hi = rows.get(fid, (0, 0, None, None))
        sz = ROW_OVERHEAD + len(r.o_orderstatus) + len(r.o_orderpriority)
        d = pd.Timestamp(r.o_orderdate)
        rows[fid] = (
            n + 1,
            b + sz,
            d if lo is None or d < lo else lo,
            d if hi is None or d > hi else hi,
        )
    return rows


def test_compaction_plan_matches_python_prefix_packing(spark):
    from ocr_to_csv_spark.functions.tableops import (
        TARGET_BYTES,
        q_compaction_plan,
    )

    man = _manifest_py()
    order = sorted(man, key=lambda f: (-man[f][1], f))
    bins = {}
    run = 0
    for fid in order:
        n, b, _, _ = man[fid]
        bin_id = run // TARGET_BYTES
        run += b
        nf, bb, br = bins.get(bin_id, (0, 0, 0))
        bins[bin_id] = (nf + 1, bb + b, br + n)
    got = q_compaction_plan(spark, SF).collect()
    assert [r.bin for r in got] == sorted(bins)
    for r in got:
        assert (r.n_files, r.bin_bytes, r.bin_rows) == bins[r.bin]


def test_compaction_bins_overfill_by_at_most_one_file(spark):
    """The prefix relaxation's guarantee: every bin except possibly the
    last holds < TARGET + its largest file's bytes."""
    from ocr_to_csv_spark.functions.tableops import (
        TARGET_BYTES,
        q_compaction_plan,
    )

    man = _manifest_py()
    max_file = max(b for _, b, _, _ in man.values())
    got = q_compaction_plan(spark, SF).collect()
    for r in got[:-1]:
        assert r.bin_bytes < TARGET_BYTES + max_file
    assert sum(r.bin_bytes for r in got) == sum(
        b for _, b, _, _ in man.values()
    )


def test_manifest_prune_matches_python(spark):
    from ocr_to_csv_spark.functions.tableops import (
        PRUNE_FROM,
        PRUNE_MIN_PRICE,
        PRUNE_TO,
        q_manifest_prune,
    )

    man = _manifest_py()
    lo, hi = pd.Timestamp(PRUNE_FROM), pd.Timestamp(PRUNE_TO)
    scanned = {
        f for f, (_, _, mn, mx) in man.items() if mx >= lo and mn < hi
    }
    rows_in_scanned = sum(man[f][0] for f in scanned)
    o = _load("orders", ["o_orderdate", "o_totalprice"])
    matched = int(
        (
            (o.o_orderdate >= lo)
            & (o.o_orderdate < hi)
            & (o.o_totalprice > PRUNE_MIN_PRICE)
        ).sum()
    )
    r = q_manifest_prune(spark, SF).collect()[0]
    assert r.n_files == len(man)
    assert r.files_scanned == len(scanned)
    assert r.files_skipped == len(man) - len(scanned)
    assert r.rows_in_scanned == rows_in_scanned
    assert r.rows_matched == matched
    assert r.skip_ratio_milli == math.floor(
        (len(man) - len(scanned)) * 1000 / len(man)
    )
    # the audit's invariant: every matching row lives in a scanned file
    assert r.rows_matched <= r.rows_in_scanned
