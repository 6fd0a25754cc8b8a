"""Stream-static enrichment join equals the batch join on the same
data, for both left-outer (unmatched kept with null segment) and
inner variants."""

import shutil

import pytest

from ocr_to_csv_spark.streaming.enrich import (
    batch_enriched_events,
    enriched_events,
)
from ocr_to_csv_spark.streaming.joins import drain_append_to_memory

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("how", ["left", "inner"])
def test_stream_static_enrichment_matches_batch(spark, tmp_path, how):
    src = str(tmp_path / "events_stream")
    (tmp_path / "events_stream").mkdir()
    shutil.copy(f"{SF}/events.parquet", src + "/part-00000.parquet")

    # trim the dim so some stream users have NO dim row — exercises the
    # outer side for real (the sf dim covers every user)
    dim_sf = str(tmp_path / "dim_sf")
    spark.read.parquet(f"{SF}/customer.parquet").filter(
        "c_custkey >= 5"
    ).write.parquet(dim_sf + "/customer.parquet")

    stream_df = enriched_events(spark, src, dim_sf, how=how)
    drain_append_to_memory(
        stream_df, f"enriched_{how}", str(tmp_path / "ckpt")
    )

    got = {
        (r["event_id"], r["user_id"], r["cents"], r["segment"])
        for r in spark.sql(f"SELECT * FROM enriched_{how}").collect()
    }
    exp = {
        (r["event_id"], r["user_id"], r["cents"], r["segment"])
        for r in batch_enriched_events(spark, src, dim_sf, how=how).collect()
    }
    assert got == exp and len(got) > 0
    if how == "left":
        # users 0-4 have no dim row → null segment rows survive
        assert any(seg is None for (_, _, _, seg) in got)
        assert any(seg is not None for (_, _, _, seg) in got)
    else:
        assert all(seg is not None for (_, _, _, seg) in got)
        assert all(uid >= 5 for (_, uid, _, _) in got)
