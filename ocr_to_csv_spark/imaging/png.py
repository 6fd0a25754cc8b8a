"""Minimal pure-Python PNG codec for 8-bit grayscale images.

The engine stores page/cell images as PNG bytes in ``binary`` DataFrame
columns (FIXTURES.md §2); this codec is the only image (de)serializer —
no Pillow/OpenCV in the runtime. Encoder always writes color type 0
(grayscale), bit depth 8, filter 0; decoder handles all five PNG filter
types plus RGB/RGBA sources (converted to grayscale) for robustness.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# decode allocation guard: a corrupt header can declare 2^32-pixel
# dimensions and OOM the worker before the IDAT length check fires;
# such blobs must raise (-> quarantine), never kill the executor
MAX_PIXELS = 64_000_000


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_gray(img: np.ndarray) -> bytes:
    """Encode a 2-D uint8 array as grayscale PNG bytes."""
    if img.ndim != 2:
        raise ValueError("encode_gray expects a 2-D array")
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = arr
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def encode_rgb(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as truecolor PNG bytes (color
    type 2, filter 0) — the datagen uses this for the color slice of the
    corpus; ``decode`` folds it back to luma."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_rgb expects an (h, w, 3) array")
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode(data: bytes) -> np.ndarray:
    """Decode PNG bytes to a 2-D uint8 grayscale array."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG stream")
    pos = 8
    width = height = bit_depth = color_type = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8 or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None or width * height == 0 or width * height > MAX_PIXELS:
        raise ValueError(f"implausible PNG dimensions {width}x{height}")
    if color_type not in (0, 2, 4, 6):
        raise ValueError(f"unsupported PNG color type {color_type}")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    stride = width * channels
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    raw = raw.reshape(height, stride + 1)
    filters = raw[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels
    for y in range(height):
        line = raw[y, 1:].astype(np.uint8).copy()
        f = filters[y]
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = line
        elif f == 2:  # Up
            out[y] = line + prev
        elif f in (1, 3, 4):  # Sub / Average / Paeth need sequential bpp steps
            cur = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if f == 1:
                    val = line[x] + a
                elif f == 3:
                    val = line[x] + ((int(a) + int(b)) >> 1)
                else:
                    val = line[x] + _paeth(
                        np.uint8(a), np.uint8(b), np.uint8(c)
                    )
                cur[x] = val
            out[y] = cur
        else:
            raise ValueError(f"bad PNG filter {f}")
    img = out.reshape(height, width, channels)
    if channels == 1:
        return img[:, :, 0]
    if channels == 2:
        return img[:, :, 0]
    rgb = img[:, :, :3].astype(np.float64)
    return np.clip(rgb @ np.array([0.299, 0.587, 0.114]), 0, 255).astype(np.uint8)
