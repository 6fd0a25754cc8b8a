"""BMP/TIFF codecs + color (PNG-RGB, JPEG 4:4:4) paths: exact
round-trips, luma folds matching the decoders bit-for-bit, truncation →
ValueError (quarantine contract), and corruption fuzz."""

import random
import time

import numpy as np
import pytest

from ocr_to_csv_spark.imaging import jpeg, png
from ocr_to_csv_spark.imaging import simple_formats as sf
from ocr_to_csv_spark.imaging.codecs import decode_image, image_dims, sniff_format


def _gray(h=37, w=53, seed=2):
    return np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)


def _rgb(h=37, w=53, seed=3):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_bmp_tiff_roundtrips_exact():
    gray, rgb = _gray(), _rgb()
    luma = sf._fold(rgb)
    cases = [
        ("bmp", sf.encode_gray_bmp(gray), gray),
        ("bmp", sf.encode_rgb_bmp(rgb), luma),
        ("tiff", sf.encode_tiff(gray), gray),
        ("tiff", sf.encode_tiff(rgb), luma),
        ("tiff", sf.encode_tiff(gray, rows_per_strip=64), gray),  # 1 strip
        ("tiff", sf.encode_tiff(rgb, rows_per_strip=5), luma),  # many strips
    ]
    for fmt, blob, want in cases:
        assert sniff_format(blob) == fmt
        np.testing.assert_array_equal(decode_image(blob), want)
        assert image_dims(blob) == (want.shape[1], want.shape[0])


def test_png_rgb_roundtrip_is_truncating_fold():
    rgb = _rgb(seed=5)
    blob = png.encode_rgb(rgb)
    want = np.clip(
        rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114]), 0, 255
    ).astype(np.uint8)
    np.testing.assert_array_equal(png.decode(blob), want)


def test_jpeg_color_decodes_to_luma_plane():
    rng = np.random.default_rng(7)
    base = np.clip(
        128 + 70 * np.sin(np.arange(64) / 6)[None, :] + rng.normal(0, 8, (48, 64)),
        0, 255,
    ).astype(np.uint8)
    rgb = np.stack(
        [np.clip(base.astype(int) + 18, 0, 255), base,
         np.clip(base.astype(int) - 30, 0, 255)], axis=-1,
    ).astype(np.uint8)
    luma = sf._fold(rgb)
    dec = jpeg.decode(jpeg.encode_color(rgb, 95))
    assert dec.shape == luma.shape
    assert np.abs(dec.astype(int) - luma.astype(int)).mean() < 3.0


def test_truncations_raise_not_hang():
    gray, rgb = _gray(), _rgb()
    for blob in (sf.encode_gray_bmp(gray), sf.encode_rgb_bmp(rgb),
                 sf.encode_tiff(gray), sf.encode_tiff(rgb)):
        for cut in (10, len(blob) // 3, len(blob) - 5):
            with pytest.raises(ValueError):
                decode_image(blob[:cut])


def test_header_bombs_raise_before_allocating():
    import struct

    bomb = bytearray(sf.encode_gray_bmp(_gray()))
    bomb[18:22] = struct.pack("<i", 2_000_000)
    bomb[22:26] = struct.pack("<i", 2_000_000)
    with pytest.raises(ValueError):
        sf.decode_bmp(bytes(bomb))

    tb = bytearray(sf.encode_tiff(_gray()))
    # ImageWidth is the first IFD entry; find its value slot by re-encode
    # trick: corrupt every SHORT that equals the true width
    w = _gray().shape[1]
    for i in range(len(tb) - 1):
        if tb[i] == w and tb[i + 1] == 0:
            tb[i : i + 2] = struct.pack("<H", 60000)
    try:
        sf.decode_tiff(bytes(tb))
    except ValueError:
        pass  # either dimension guard or strip-length check fires


def test_bmp_tiff_fuzz():
    gray, rgb = _gray(), _rgb()
    for blob, seed in ((sf.encode_gray_bmp(gray), 20),
                       (sf.encode_rgb_bmp(rgb), 21),
                       (sf.encode_tiff(gray), 22),
                       (sf.encode_tiff(rgb), 23),
                       (jpeg.encode_color(rgb, 90), 24),
                       (png.encode_rgb(rgb), 25)):
        rng = random.Random(seed)
        t0 = time.time()
        for _ in range(150):
            data = bytearray(blob)
            for _ in range(rng.randint(1, 8)):
                data[rng.randrange(len(data))] = rng.randrange(256)
            try:
                out = decode_image(bytes(data))
                assert out.nbytes <= 256_000_000
            except Exception:
                pass
        assert time.time() - t0 < 60
