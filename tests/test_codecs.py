"""Batch 22: hand-computed fixtures for gap-encoded postings (incl.
round-trip invariant and df=1 empty-gaps edge), run-length encoding
change-points, and 2-D histogram binning."""

import datetime

from ocr_to_csv_spark.functions.codecs import (
    q_histogram2d,
    q_postings_delta,
    q_rle_events,
)

TS = datetime.datetime

EV_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)


def test_postings_delta_gaps_and_roundtrip(spark, tmp_path):
    rows = [
        (3, "alpha beta", "en", "s", 1),
        (7, "alpha", "en", "s", 1),
        (20, "alpha gamma", "en", "s", 1),
    ]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["tok"]: (
            r["df"], r["first_doc"], r["gaps_csv"], r["sum_gaps"],
            r["roundtrip_ok"],
        )
        for r in q_postings_delta(spark, str(tmp_path)).collect()
    }
    # alpha: postings [3,7,20] → gaps [4,13], sum 17, 3+17 == 20
    assert got["alpha"] == (3, 3, "4,13", 17, 1)
    # df=1 tokens: empty gaps, sum 0, first == last
    assert got["beta"] == (1, 3, "", 0, 1)
    assert got["gamma"] == (1, 20, "", 0, 1)


def test_rle_change_points(spark, tmp_path):
    t0 = TS(2024, 1, 1)

    def at(s):
        return t0 + datetime.timedelta(seconds=s)

    # user 1 sequence: a a b a → runs [a×2, b×1, a×1] → 3 runs, max 2
    rows = [
        (1, at(0), 1, "a", 1.0, "{}"),
        (2, at(1), 1, "a", 1.0, "{}"),
        (3, at(2), 1, "b", 1.0, "{}"),
        (4, at(3), 1, "a", 1.0, "{}"),
        # user 2: single event → 1 run
        (5, at(0), 2, "x", 1.0, "{}"),
    ]
    spark.createDataFrame(rows, EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r["user_id"]: (r["n_runs"], r["max_run"], r["n_events"])
        for r in q_rle_events(spark, str(tmp_path)).collect()
    }
    assert got == {1: (3, 2, 4), 2: (1, 1, 1)}


def test_histogram2d_cells(spark, tmp_path):
    rows = [
        # hour 0: 10.00 → band 0; 60.00 → band 1
        (1, TS(2024, 1, 1, 0, 5), 1, "a", 10.00, "{}"),
        (2, TS(2024, 1, 1, 0, 6), 1, "a", 60.00, "{}"),
        # hour 3: two in band 0 (exact sum check)
        (3, TS(2024, 1, 1, 3, 0), 1, "a", 1.00, "{}"),
        (4, TS(2024, 1, 1, 3, 1), 1, "a", 2.00, "{}"),
    ]
    spark.createDataFrame(rows, EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        (r["h"], r["band"]): (r["n"], r["sum_cents"])
        for r in q_histogram2d(spark, str(tmp_path)).collect()
    }
    assert got == {
        (0, 0): (1, 1000),
        (0, 1): (1, 6000),
        (3, 0): (2, 300),
    }
