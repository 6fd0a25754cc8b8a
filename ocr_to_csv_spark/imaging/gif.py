"""Pure-Python GIF codec (decode + fixture encoder).

GIF is the remaining ubiquitous web-corpus image format after
PNG/JPEG/BMP/TIFF/WebP (a crawl pipeline sees it constantly even though
the reference's ``cv2.imread`` does not list it). Scope:

- **decode**: GIF87a/GIF89a, global and local color tables, interlaced
  and sequential scan order, full variable-width LZW decompression
  (clear/end codes, dictionary growth to 4096, deferred clear), first
  frame only — the still-image contract every sibling codec follows;
  animation frame COUNT is exposed via ``frame_count`` for metadata.
  Palette entries fold to luma with the same truncating
  0.299/0.587/0.114 dot product as the PNG decoder. Malformed input
  raises ``ValueError`` → quarantine.
- **encode_gray**: GIF89a with a 256-entry gray ramp global table and
  standard LZW compression (optionally interlaced) — lossless for
  8-bit grayscale, so golden fixtures are computed from the pre-encode
  arrays (the PNG/WAV/WebP convention).
"""

from __future__ import annotations

import struct

import numpy as np

MAX_PIXELS = 64_000_000  # same OOM guard as the PNG decoder

_LUMA = np.array([0.299, 0.587, 0.114])


# ------------------------------------------------------------------- decode


def _read_color_table(data: bytes, off: int, size_field: int):
    n = 2 << size_field  # 2^(size+1) entries
    end = off + 3 * n
    if end > len(data):
        raise ValueError("gif: truncated color table")
    tab = np.frombuffer(data[off:end], dtype=np.uint8).reshape(n, 3)
    return tab, end


def _skip_sub_blocks(data: bytes, off: int) -> int:
    while True:
        if off >= len(data):
            raise ValueError("gif: truncated sub-blocks")
        n = data[off]
        off += 1 + n
        if n == 0:
            return off


def _collect_sub_blocks(data: bytes, off: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if off >= len(data):
            raise ValueError("gif: truncated image data")
        n = data[off]
        off += 1
        if n == 0:
            return b"".join(chunks), off
        if off + n > len(data):
            raise ValueError("gif: truncated image data")
        chunks.append(data[off : off + n])
        off += n


def _lzw_decode(code_size: int, data: bytes, n_pixels: int) -> bytearray:
    """Variable-width GIF-LZW → index stream of exactly n_pixels."""
    if not 2 <= code_size <= 8:
        raise ValueError("gif: bad LZW minimum code size")
    clear = 1 << code_size
    end = clear + 1
    out = bytearray()
    # dictionary: code -> bytes
    base = {i: bytes([i]) for i in range(clear)}
    table = dict(base)
    next_code = end + 1
    width = code_size + 1
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("gif: LZW stream exhausted")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = dict(base)
            next_code = end + 1
            width = code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("gif: bad first LZW code")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise ValueError("gif: LZW code out of range")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("gif: LZW output short")
    return out[:n_pixels]


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray, w: int, h: int) -> np.ndarray:
    out = np.empty((h, w), dtype=np.uint8)
    src = idx.reshape(-1, w)
    row = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = src[row]
            row += 1
    return out


def _parse(data: bytes):
    """Walk the GIF structure; yields (first_frame_luma, n_frames)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    if len(data) < 13:
        raise ValueError("gif: truncated header")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    off = 13
    gct = None
    if packed & 0x80:
        gct, off = _read_color_table(data, off, packed & 0x07)
    first: np.ndarray | None = None
    n_frames = 0
    while off < len(data):
        b = data[off]
        off += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            if off >= len(data):
                raise ValueError("gif: truncated extension")
            off = _skip_sub_blocks(data, off + 1)
            continue
        if b != 0x2C:
            raise ValueError(f"gif: unknown block 0x{b:02x}")
        if off + 9 > len(data):
            raise ValueError("gif: truncated image descriptor")
        _l, _t, iw, ih, ipacked = struct.unpack("<HHHHB", data[off : off + 9])
        off += 9
        if iw == 0 or ih == 0 or iw * ih > MAX_PIXELS:
            raise ValueError("gif: bad frame dimensions")
        table = gct
        if ipacked & 0x80:
            table, off = _read_color_table(data, off, ipacked & 0x07)
        if table is None:
            raise ValueError("gif: frame without color table")
        if off >= len(data):
            raise ValueError("gif: missing LZW code size")
        code_size = data[off]
        off += 1
        if n_frames == 0:
            lzw, off = _collect_sub_blocks(data, off)
            idx = np.frombuffer(
                _lzw_decode(code_size, lzw, iw * ih), dtype=np.uint8
            )
            if idx.max(initial=0) >= len(table):
                raise ValueError("gif: palette index out of range")
            if ipacked & 0x40:
                grid = _deinterlace(idx, iw, ih)
            else:
                grid = idx.reshape(ih, iw)
            if (table[:, 0] == table[:, 1]).all() and (
                table[:, 1] == table[:, 2]
            ).all():
                # gray palette: no lossy luma fold (PNG-path parity)
                first = table[:, 0][grid]
            else:
                rgb = table[grid].astype(np.float64)
                first = np.clip(rgb @ _LUMA, 0, 255).astype(np.uint8)
        else:
            off = _skip_sub_blocks(data, off)
        n_frames += 1
    if first is None:
        raise ValueError("gif: no image frame")
    return first, n_frames


def decode(data: bytes) -> np.ndarray:
    """First frame → 2-D uint8 luma array."""
    return _parse(data)[0]


def frame_count(data: bytes) -> int:
    return _parse(data)[1]


def dims(data: bytes) -> tuple[int, int]:
    """Logical screen (width, height) from the header only."""
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        raise ValueError("gif: bad header")
    sw, sh = struct.unpack("<HH", data[6:10])
    return int(sw), int(sh)


# ------------------------------------------------------------------- encode


def _lzw_encode(code_size: int, indices: bytes) -> bytes:
    clear = 1 << code_size
    end = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = code_size + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    cur = b""
    for ch in indices:
        nxt = cur + bytes([ch])
        if nxt in table:
            cur = nxt
            continue
        # emit at the CURRENT width, then grow. The decoder's dictionary
        # lags the encoder's by exactly one entry (it can only register
        # an entry after seeing the NEXT code), so the encoder widens one
        # assignment LATER than the decoder's next_code == 2^width rule.
        emit(table[cur])
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = code_size + 1
        cur = bytes([ch])
    if cur:
        emit(table[cur])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gray(arr: np.ndarray, interlace: bool = False) -> bytes:
    """2-D uint8 array → GIF89a bytes (256-gray global table, LZW)."""
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError("encode_gray expects 2-D uint8")
    h, w = arr.shape
    if not (0 < w <= 65535 and 0 < h <= 65535):
        raise ValueError("encode_gray: dims out of GIF range")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # 256-entry GCT
    for v in range(256):
        out += bytes((v, v, v))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    if interlace:
        rows = []
        for start, step in _INTERLACE_PASSES:
            for y in range(start, h, step):
                rows.append(arr[y])
        flat = np.concatenate(rows).tobytes()
    else:
        flat = arr.tobytes()
    out.append(8)  # LZW minimum code size
    lzw = _lzw_encode(8, flat)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
