"""AVI video modality: container parse, MJPEG/raw frame decode parity
with synthesis-time goldens, frame-sampling semantics, and the
corrupt-blob contract."""

import numpy as np
from pyspark.sql import Row

from ocr_to_csv_spark.extraction import video


def test_video_features_match_goldens_and_quarantine(spark):
    rows, expected = [], {}
    for s, codec in enumerate(["raw", "mjpg", "raw"]):
        data, exp = video.synth_avi(
            s, w=40 + 8 * s, h=32, n_frames=9 + 3 * s, fps=8 + s,
            codec=codec,
        )
        rows.append(Row(media_ref=exp["media_ref"], content=bytearray(data)))
        expected[exp["media_ref"]] = exp
    # truncated container → corrupt_avi, never a task failure
    bad, _ = video.synth_avi(50, codec="mjpg")
    rows.append(Row(media_ref="avi-bad", content=bytearray(bad[: len(bad) // 2])))
    # not an AVI at all
    rows.append(Row(media_ref="not-avi", content=bytearray(b"RIFF\x10\x00\x00\x00JUNKdata")))

    df = spark.createDataFrame(rows, "media_ref string, content binary")
    got = {r["media_ref"]: r.asDict()
           for r in video.video_features(df, every_n=3).collect()}

    for ref, exp in expected.items():
        for k, v in exp.items():
            assert got[ref][k] == v, (ref, k, got[ref][k], v)
    assert got["avi-bad"]["fmt"] == "corrupt_avi"
    assert got["not-avi"]["fmt"] == "corrupt_avi"


def test_sample_frames_every_n():
    data, _ = video.synth_avi(3, n_frames=10, codec="raw")
    hdr, all_frames = video.sample_frames(data, 1)
    assert hdr["fourcc"] == b"Y800" and len(all_frames) == 10
    _, every3 = video.sample_frames(data, 3)
    assert len(every3) == 4  # frames 0, 3, 6, 9
    for got, want in zip(every3, all_frames[::3]):
        np.testing.assert_array_equal(got, want)
    _, every100 = video.sample_frames(data, 100)
    assert len(every100) == 1  # always at least frame 0


def test_mjpeg_frames_roundtrip_through_jpeg_codec():
    """MJPEG frame payloads are standalone baseline JPEGs — each must
    decode via the in-repo codec to the same plane the synthesizer saw."""
    from ocr_to_csv_spark.imaging import jpeg as jpegc

    data, _ = video.synth_avi(5, codec="mjpg", n_frames=4)
    hdr, payloads = video.parse_avi(data)
    assert hdr["fourcc"] == b"MJPG" and len(payloads) == 4
    for p in payloads:
        img = jpegc.decode(p)
        assert img.shape == (hdr["height"], hdr["width"])


def test_raw_goldens_are_pre_encode_exact():
    """Y800 is lossless: decoded frames equal the synthesis arrays."""
    seed, w, h = 9, 48, 32
    data, _ = video.synth_avi(seed, w=w, h=h, n_frames=6, codec="raw")
    _, frames = video.sample_frames(data, 1)
    for f, img in enumerate(frames):
        want = ((3 * np.arange(w)[None, :] + 5 * np.arange(h)[:, None]
                 + 7 * f + seed) % 256).astype(np.uint8)
        np.testing.assert_array_equal(img, want)


def test_video_signatures_shape_and_determinism(spark):
    data, exp = video.synth_avi(2, codec="raw")
    df = spark.createDataFrame(
        [Row(media_ref=exp["media_ref"], content=bytearray(data)),
         Row(media_ref="bad", content=bytearray(data[:40]))],
        "media_ref string, content binary",
    )
    out = video.video_signatures(df, every_n=3).collect()
    assert len(out) == 1  # corrupt blob contributes no signature row
    feat = out[0]["feat"]
    assert len(feat) == 264
    _, frames = video.sample_frames(data, 3)
    np.testing.assert_array_equal(
        np.asarray(feat, dtype=np.float32), video.video_signature_np(frames)
    )


def test_header_bomb_quarantines():
    """A container declaring absurd dimensions must raise promptly, not
    allocate: the 10^12-doc corpus WILL contain hostile headers."""
    data, _ = video.synth_avi(1, codec="raw", n_frames=2)
    # corrupt the avih width field to 2^31-ish
    import struct
    idx = data.index(b"avih") + 8
    bomb = bytearray(data)
    bomb[idx + 32 : idx + 36] = struct.pack("<I", 60000)
    bomb[idx + 36 : idx + 40] = struct.pack("<I", 60000)
    row = video._features_one("bomb", bytes(bomb), 3)
    assert row[1] == "corrupt_avi"
