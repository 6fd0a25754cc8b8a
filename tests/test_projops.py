"""Batch 46: JL projection sign-matrix mirror, distance-preservation
bounds, and a hand-computed tie-corrected AUC."""

import datetime
import hashlib

from ocr_to_csv_spark.functions.projops import (
    IN_DIM,
    RP_DIM,
    _sign,
    q_auc_roc,
    q_rp_pairs_ratio,
)

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def test_sign_matrix_is_md5_parity_and_balanced():
    # independent mirror of the DuckDB-side expression
    for j, k in [(0, 0), (3, 17), (15, 63)]:
        h = int(hashlib.md5(f"rp{j},{k}".encode()).hexdigest()[:8], 16)
        assert _sign(j, k) == (1.0 if h % 2 == 0 else -1.0)
    total = sum(
        _sign(j, k) for j in range(RP_DIM) for k in range(IN_DIM)
    )
    assert abs(total) < 0.2 * RP_DIM * IN_DIM  # roughly balanced ±1


def test_rp_distance_preservation(spark):
    got = q_rp_pairs_ratio(spark, "/root/testdata/sf0.001").collect()
    assert len(got) > 50
    # E[d2_proj] = RP_DIM * d2_full for an unscaled ±1 JL matrix
    ratios = [
        r["d2_proj_s"] / (RP_DIM * r["d2_full_s"])
        for r in got if r["d2_full_s"] > 0
    ]
    mean = sum(ratios) / len(ratios)
    assert 0.5 < mean < 1.5, mean


def test_auc_hand_computed(spark, tmp_path):
    rows = [
        (1, datetime.datetime(2026, 1, 1), 1, "purchase", 3.0, ""),
        (2, datetime.datetime(2026, 1, 1), 1, "purchase", 2.0, ""),
        (3, datetime.datetime(2026, 1, 1), 1, "view", 1.0, ""),
        (4, datetime.datetime(2026, 1, 1), 1, "click", 2.0, ""),
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    r = q_auc_roc(spark, str(tmp_path)).collect()[0]
    # pairwise: 3>1, 3>2, 2>1 wins + one 2=2 tie → AUC = 3.5/4 = 7/8
    assert (r["u2"], r["n_pos"], r["n_neg"]) == (7, 2, 2)
