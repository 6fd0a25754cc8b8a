"""Netpbm (PGM/PPM) codec + multimodal plumbing."""

import numpy as np
import pytest

from ocr_to_csv_spark.imaging import codecs, netpbm


def _img():
    return (np.arange(48, dtype=np.int64) * 11 % 256).reshape(6, 8).astype(
        np.uint8
    )


def test_roundtrip_gray_binary_and_ascii():
    img = _img()
    assert np.array_equal(netpbm.decode(netpbm.encode_gray(img, True)), img)
    assert np.array_equal(netpbm.decode(netpbm.encode_gray(img, False)), img)


def test_rgb_folds_to_package_luma():
    img = _img()
    rgb = np.stack([img, img // 2, (img.astype(int) * 2 % 256)], axis=-1)
    rgb = rgb.astype(np.uint8)
    luma = (
        (rgb[:, :, 0].astype(int) * 299 + rgb[:, :, 1].astype(int) * 587
         + rgb[:, :, 2].astype(int) * 114) // 1000
    ).astype(np.uint8)
    assert np.array_equal(netpbm.decode(netpbm.encode_rgb(rgb)), luma)


def test_16bit_scales_to_8bit():
    img = _img()
    blob = b"P5\n8 6\n65535\n" + (img.astype(">u2") * 257).tobytes()
    assert np.array_equal(netpbm.decode(blob), img)


def test_comments_and_dims():
    blob = b"P2\n# c1\n2 2\n# c2\n255\n0 255\n128 64\n"
    assert netpbm.decode(blob).tolist() == [[0, 255], [128, 64]]
    assert netpbm.dims(blob) == (2, 2)
    assert codecs.sniff_format(blob) == "netpbm"


@pytest.mark.parametrize(
    "bad",
    [
        b"P7 1 1 255 \x00",
        b"P5\n2 2\n255\n\x00",  # truncated raster
        b"P2\n2 2\n0\n0 0 0 0\n",  # maxval 0
        b"P5\n2 2\n255\nQQQQ"[:10] + b"\xff",  # enough? still 3 bytes short
        b"P2\n2 2\n255\n1 2 3\n",  # short ascii raster
        b"P5\nxx 2\n255\n\x00\x00\x00\x00",  # non-numeric header
    ],
)
def test_corrupt_raises_valueerror(bad):
    with pytest.raises(ValueError):
        netpbm.decode(bad)


def test_flows_through_multimodal_metadata(spark):
    """PGM/PPM blobs land in the media pipeline with real dims/stats;
    a truncated blob quarantines as corrupt."""
    from ocr_to_csv_spark.extraction.multimodal import media_metadata

    img = _img()
    rgb = np.stack([img, img, img], axis=-1).astype(np.uint8)
    rows = [
        ("pgm-1", bytearray(netpbm.encode_gray(img))),
        ("ppm-1", bytearray(netpbm.encode_rgb(rgb))),
        ("bad-1", bytearray(netpbm.encode_gray(img)[:20])),
    ]
    media = spark.createDataFrame(rows, "media_ref string, content binary")
    got = {r.media_ref: r for r in media_metadata(media).collect()}
    assert got["pgm-1"].width == 8 and got["pgm-1"].height == 6
    assert got["ppm-1"].width == 8 and got["ppm-1"].height == 6
    exp_mean = int(img.astype(int).mean())
    assert abs(got["pgm-1"].mean_intensity - exp_mean) <= 1
    assert got["bad-1"].fmt == "corrupt_netpbm"
    assert got["bad-1"].width == -1
