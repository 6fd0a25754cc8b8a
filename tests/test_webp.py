"""VP8L (lossless WebP) codec tests: encoder/decoder roundtrips plus
hand-built bitstreams that exercise decoder paths the fixture encoder
never emits (LZ77 backrefs, color cache, palette/color-indexing), and
unit checks of the predictor/color-transform inverses."""

import struct

import numpy as np
import pytest

from ocr_to_csv_spark.imaging import codecs, webp
from ocr_to_csv_spark.imaging.webp import (
    _DIST_MAP,
    _avg2,
    _BitWriter,
    _clamp_add_sub_full,
    _clamp_add_sub_half,
    _delta,
    _inv_predictor,
    _inv_subtract_green,
    _select,
    _write_normal_code,
    _write_simple_code,
    canonical_codes,
)


def _container(bw: _BitWriter) -> bytes:
    payload = bw.tobytes()
    padded = payload + (b"\x00" if len(payload) & 1 else b"")
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(padded))
        + b"WEBP"
        + b"VP8L"
        + struct.pack("<I", len(payload))
        + padded
    )


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


# ------------------------------------------------------------- roundtrips


def test_roundtrip_shapes_and_values():
    rng = np.random.RandomState(7)
    for shape in [(1, 1), (3, 5), (16, 16), (40, 33), (1, 200), (200, 1)]:
        a = rng.randint(0, 256, shape).astype(np.uint8)
        data = webp.encode_gray(a)
        out = webp.decode(data)
        assert out.shape == a.shape and (out == a).all()
        assert webp.dims(data) == (shape[1], shape[0])


def test_roundtrip_constant_and_binary():
    a = np.full((10, 10), 200, np.uint8)
    assert (webp.decode(webp.encode_gray(a)) == a).all()
    b = (np.random.RandomState(1).rand(50, 70) > 0.5).astype(np.uint8) * 255
    assert (webp.decode(webp.encode_gray(b)) == b).all()


def test_corrupt_inputs_raise_valueerror():
    blob = webp.encode_gray(np.arange(64, dtype=np.uint8).reshape(8, 8))
    for bad in (b"", b"RIFF", blob[:20], blob[: len(blob) // 2],
                b"RIFF\x04\x00\x00\x00WEBP"):
        with pytest.raises(ValueError):
            webp.decode(bad)


def test_lossy_vp8_rejected():
    data = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    with pytest.raises(ValueError, match="lossy"):
        webp.decode(data)


def test_codecs_dispatch():
    a = np.arange(48, dtype=np.uint8).reshape(6, 8)
    blob = webp.encode_gray(a)
    assert codecs.sniff_format(blob) == "webp"
    assert (codecs.decode_image(blob) == a).all()
    assert codecs.image_dims(blob) == (8, 6)


# -------------------------------------------------- hand-built bitstreams


def test_lz77_backref_stream():
    # 4x1 image: one literal (gray 200) then a length-3 backref dist 1
    bw = _BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    green = _write_normal_code(bw, {200: 1, 258: 1}, 256 + 24)
    _write_simple_code(bw, 200)  # red
    _write_simple_code(bw, 200)  # blue
    _write_simple_code(bw, 255)  # alpha
    _write_simple_code(bw, 1)  # distance: sym 1 -> code 2 -> (1,0) -> 1
    bw.write_code(*green[200])  # literal pixel 0
    bw.write_code(*green[258])  # length code 2 -> length 3
    out = webp.decode(_container(bw))
    assert out.shape == (1, 4)
    assert (out == 200).all()


def test_color_cache_stream():
    # 2x1 image: literal inserts into a 4-bit cache, second pixel is a
    # cache hit
    argb = (255 << 24) | (77 << 16) | (77 << 8) | 77
    idx = (0x1E35A7BD * argb & 0xFFFFFFFF) >> 28
    bw = _BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(4, 4)  # cache bits
    bw.write(0, 1)  # no meta prefix codes
    cache_sym = 256 + 24 + idx
    green = _write_normal_code(bw, {77: 1, cache_sym: 1}, 256 + 24 + 16)
    _write_simple_code(bw, 77)  # red
    _write_simple_code(bw, 77)  # blue
    _write_simple_code(bw, 255)  # alpha
    _write_simple_code(bw, 0)  # distance (unused)
    bw.write_code(*green[77])
    bw.write_code(*green[cache_sym])
    out = webp.decode(_container(bw))
    assert (out == np.array([[77, 77]])).all()


def test_palette_bundled_stream():
    # 4x1 image through a 4-entry palette -> width_bits=2, all four
    # 2-bit indices bundled into ONE coded pixel's green channel
    grays = [10, 50, 90, 130]
    bw = _BitWriter()
    _header(bw, 4, 1)
    bw.write(1, 1)  # transform present
    bw.write(3, 2)  # color indexing
    bw.write(3, 8)  # palette size - 1
    # palette sub-image (4x1), delta-coded: first entry full, rest +40
    bw.write(0, 1)  # no cache (sub-image reads its own cache bit)
    green = _write_normal_code(bw, {10: 1, 40: 1}, 256 + 24)
    red = _write_normal_code(bw, {10: 1, 40: 1}, 256)
    blue = _write_normal_code(bw, {10: 1, 40: 1}, 256)
    alpha = _write_normal_code(bw, {255: 1, 0: 1}, 256)
    _write_simple_code(bw, 0)  # distance
    deltas = [(255, 10), (0, 40), (0, 40), (0, 40)]  # (alpha, gray)
    for a, v in deltas:
        bw.write_code(*green[v])
        bw.write_code(*red[v])
        bw.write_code(*blue[v])
        bw.write_code(*alpha[a])
    bw.write(0, 1)  # no more transforms
    # main image: coded width ceil(4/4)=1, one packed literal
    packed = 0 | (1 << 2) | (2 << 4) | (3 << 6)
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    g2 = _write_normal_code(bw, {packed: 1, 0: 1}, 256 + 24)
    _write_simple_code(bw, 0)  # red
    _write_simple_code(bw, 0)  # blue
    _write_simple_code(bw, 255)  # alpha
    _write_simple_code(bw, 0)  # distance
    bw.write_code(*g2[packed])
    out = webp.decode(_container(bw))
    assert out.tolist() == [grays]


# ------------------------------------------------------- transform units


def test_inv_subtract_green():
    px = [(255 << 24) | (10 << 16) | (100 << 8) | 250]
    _inv_subtract_green(px, 1, 1)
    p = px[0]
    assert (p >> 16) & 0xFF == (10 + 100) & 0xFF
    assert (p >> 8) & 0xFF == 100
    assert p & 0xFF == (250 + 100) & 0xFF


def test_predictor_helpers():
    a = (255 << 24) | (10 << 16) | (20 << 8) | 30
    b = (255 << 24) | (20 << 16) | (40 << 8) | 50
    av = _avg2(a, b)
    assert (av >> 16) & 0xFF == 15 and (av >> 8) & 0xFF == 30
    # clamped full add-subtract saturates at 0 and 255
    hi = (255 << 24) | (250 << 16) | (250 << 8) | 250
    lo = (255 << 24) | (5 << 16) | (5 << 8) | 5
    full = _clamp_add_sub_full(hi, hi, lo)
    assert (full >> 16) & 0xFF == 255
    full0 = _clamp_add_sub_full(lo, lo, hi)
    assert (full0 >> 16) & 0xFF == 0
    # half variant truncates toward zero for negative deltas
    x = (0 << 24) | (0 << 16) | (10 << 8) | 0
    y = (0 << 24) | (0 << 16) | (13 << 8) | 0
    # d = 10-13 = -3 -> half = -1 (C trunc), result 9
    assert (_clamp_add_sub_half(x, y) >> 8) & 0xFF == 9
    # select: ties go to top
    t = (255 << 24) | (1 << 16)
    l = (255 << 24) | (3 << 16)
    tl = (255 << 24) | (2 << 16)
    assert _select(l, t, tl) == t  # |l-tl| == |t-tl| == 1 -> top


def test_inv_predictor_modes_left_and_top():
    # 2x2 residuals, block bits large enough for a single mode cell
    w = h = 2
    # mode 1 (L) for the whole image
    px = [
        (255 << 24) | (5 << 8),  # (0,0): +black pred -> a=255+255? no:
        (0 << 24) | (7 << 8),
        (0 << 24) | (1 << 8),
        (0 << 24) | (2 << 8),
    ]
    # (0,0) pred is opaque black (0xFF000000): alpha wraps 255+255=254
    modes = [(1 << 8)]  # green channel carries the mode
    _inv_predictor(px, w, h, bits=2, modes=modes)
    g = [(p >> 8) & 0xFF for p in px]
    # row 0: (0,0)=5; (0,1) pred=L -> 5+7=12
    # row 1: (1,0) pred=T -> 5+1=6 ; (1,1) mode L -> 6+2=8
    assert g == [5, 12, 6, 8]


def test_color_transform_delta_sign():
    # t=0xFF is -1 in 3.5 fixed point: delta(-1, 64) = -64>>5 = -2
    assert _delta(0xFF, 64) == (-1 * 64) >> 5
    assert _delta(2, 64) == (2 * 64) >> 5


# ------------------------------------------------------------- structure


def test_distance_map_structure():
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120
    assert _DIST_MAP[:4] == ((0, 1), (1, 0), (1, 1), (-1, 1))
    for dx, dy in _DIST_MAP:
        assert 0 <= dy <= 8 and -8 <= dx <= 8


def test_canonical_codes_prefix_free():
    lengths = [0] * 300
    for s, ln in {5: 2, 9: 2, 17: 3, 33: 3, 200: 3, 258: 3}.items():
        lengths[s] = ln
    codes = canonical_codes(lengths)
    items = sorted(codes.values())
    for i, (c1, l1) in enumerate(items):
        for c2, l2 in items[i + 1 :]:
            if l1 <= l2:
                assert (c2 >> (l2 - l1)) != c1, "prefix collision"
