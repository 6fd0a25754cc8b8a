"""GIF codec tests: LZW roundtrips (sequential + interlaced, across the
9→12-bit width growth and a 4096 dictionary reset), corrupt handling,
and dispatch integration."""

import numpy as np
import pytest

from ocr_to_csv_spark.imaging import codecs, gif
from ocr_to_csv_spark.imaging.gif import (
    _INTERLACE_PASSES,
    _lzw_decode,
    _lzw_encode,
)


def test_roundtrip_shapes():
    rng = np.random.RandomState(3)
    for shape in [(1, 1), (5, 7), (16, 16), (64, 96), (130, 211)]:
        for inter in (False, True):
            a = rng.randint(0, 256, shape).astype(np.uint8)
            blob = gif.encode_gray(a, interlace=inter)
            out = gif.decode(blob)
            assert out.shape == a.shape and (out == a).all(), (shape, inter)
            assert gif.dims(blob) == (shape[1], shape[0])
            assert gif.frame_count(blob) == 1


def test_roundtrip_crosses_width_growth_and_table_reset():
    rng = np.random.RandomState(9)
    # 256x256 random forces codes through every width up to 12 and at
    # least one CLEAR-triggered dictionary reset
    big = rng.randint(0, 256, (256, 256)).astype(np.uint8)
    assert (gif.decode(gif.encode_gray(big)) == big).all()
    smooth = np.tile(np.arange(256, dtype=np.uint8), (300, 1))
    assert (gif.decode(gif.encode_gray(smooth)) == smooth).all()


def test_lzw_layer_exact():
    s = bytes([1, 2, 3, 1, 2, 3, 1, 2, 3, 4]) * 50
    enc = _lzw_encode(8, s)
    assert bytes(_lzw_decode(8, enc, len(s))) == s
    with pytest.raises(ValueError):
        _lzw_decode(8, enc[: len(enc) // 4], len(s))


def test_interlace_pass_structure():
    # the four passes cover every row exactly once
    h = 23
    rows = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    assert sorted(rows) == list(range(h))
    assert len(set(rows)) == h


def test_corrupt_inputs_raise():
    blob = gif.encode_gray(np.arange(64, dtype=np.uint8).reshape(8, 8))
    for bad in (b"", b"GIF89a", blob[:20], blob[: len(blob) // 2],
                b"GIF88a" + blob[6:]):
        with pytest.raises(ValueError):
            gif.decode(bad)


def test_extension_blocks_skipped():
    # inject a graphic-control extension before the image descriptor
    blob = bytearray(gif.encode_gray(np.full((4, 4), 9, np.uint8)))
    idx = 13 + 768  # image descriptor sits right after header + 256-entry GCT
    assert blob[idx] == 0x2C
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    patched = bytes(blob[:idx]) + gce + bytes(blob[idx:])
    out = gif.decode(patched)
    assert (out == 9).all()


def test_codecs_dispatch():
    a = np.arange(48, dtype=np.uint8).reshape(6, 8)
    blob = gif.encode_gray(a)
    assert codecs.sniff_format(blob) == "gif"
    assert (codecs.decode_image(blob) == a).all()
    assert codecs.image_dims(blob) == (8, 6)
