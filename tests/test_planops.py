"""Batch 105: layout advisor + watermark planner — python mirrors and
the decision-direction properties (bucket wins point probes, date
layouts win range scans; recommended δ is minimal and sufficient)."""

import glob

import pandas as pd

SF = "/root/testdata/sf0.001"


def _orders():
    files = sorted(glob.glob(f"{SF}/orders.parquet")) or sorted(
        glob.glob(f"{SF}/orders.parquet/*.parquet")
    )
    return pd.concat(
        pd.read_parquet(f, columns=["o_orderdate", "o_custkey"])
        for f in files
    )


def test_layout_advisor_matches_python(spark):
    from ocr_to_csv_spark.functions.planops import (
        N_BUCKETS,
        WORKLOAD,
        q_layout_advisor,
    )

    o = _orders()
    mans = {}
    for _, r in o.iterrows():
        d = pd.Timestamp(r.o_orderdate)
        for layout, pk in (
            ("month", d.to_period("M")),
            ("year", d.to_period("Y")),
            ("bucket", int(r.o_custkey) % N_BUCKETS),
        ):
            n, mn, mx = mans.get((layout, pk), (0, None, None))
            mans[(layout, pk)] = (
                n + 1,
                d if mn is None or d < mn else mn,
                d if mx is None or d > mx else mx,
            )
    expect = {}
    for qid, kind, lo, hi, key in WORKLOAD:
        lo_t, hi_t = pd.Timestamp(lo) if lo else None, (
            pd.Timestamp(hi) if hi else None
        )
        for layout in ("month", "year", "bucket"):
            parts = [(pk, v) for (l, pk), v in mans.items() if l == layout]
            scanned = rows_sc = 0
            for pk, (n, mn, mx) in parts:
                if kind == "date":
                    hit = layout == "bucket" or (mx >= lo_t and mn < hi_t)
                else:
                    hit = layout != "bucket" or pk == key % N_BUCKETS
                if hit:
                    scanned += 1
                    rows_sc += n
            total_rows = sum(n for _, (n, _, _) in parts)
            expect[(layout, qid)] = (
                len(parts), scanned, rows_sc, total_rows,
                rows_sc * 1000 // total_rows,
            )
    got = q_layout_advisor(spark, SF).collect()
    assert len(got) == len(expect)
    for r in got:
        assert (
            r.parts_total, r.parts_scanned, r.rows_scanned,
            r.rows_total, r.scan_milli,
        ) == expect[(r.layout, r.query_id)], (r.layout, r.query_id)
    # decision direction: bucket layout scans less for key probes,
    # month layout scans less for the narrow date range
    by = {(r.layout, r.query_id): r for r in got}
    assert by[("bucket", 4)].scan_milli < by[("month", 4)].scan_milli
    assert by[("month", 1)].scan_milli < by[("bucket", 1)].scan_milli
    # finer time grain never scans more rows than coarser
    for qid in (1, 2, 3):
        assert (
            by[("month", qid)].rows_scanned
            <= by[("year", qid)].rows_scanned
        )


def test_watermark_plan_matches_python(spark):
    from ocr_to_csv_spark.functions.planops import (
        WM_CANDIDATES,
        WM_SLO_MILLI,
        q_watermark_plan,
    )

    files = sorted(glob.glob(f"{SF}/events.parquet")) or sorted(
        glob.glob(f"{SF}/events.parquet/*.parquet")
    )
    e = pd.concat(
        pd.read_parquet(f, columns=["event_id"]) for f in files
    )
    delays = [int(x) * 37 % 977 for x in e.event_id]
    n = len(delays)
    rows = {}
    for c in WM_CANDIDATES:
        dropped = sum(1 for d in delays if d > c)
        rows[c] = (n, dropped, (n - dropped) * 1000 // n)
    rec = min(
        (c for c in WM_CANDIDATES if rows[c][2] >= WM_SLO_MILLI),
        default=-1,
    )
    got = q_watermark_plan(spark, SF).collect()
    assert [r.delta_sec for r in got] == sorted(WM_CANDIDATES)
    for r in got:
        assert (r.n_events, r.n_dropped, r.capture_milli) == rows[r.delta_sec]
        assert r.recommended_sec == rec
    # monotone: larger δ never drops more
    drops = [r.n_dropped for r in got]
    assert drops == sorted(drops, reverse=True)
    # the recommendation meets the SLO and the next-smaller δ does not
    assert rows[rec][2] >= WM_SLO_MILLI
    smaller = [c for c in WM_CANDIDATES if c < rec]
    if smaller:
        assert rows[max(smaller)][2] < WM_SLO_MILLI
