"""Pure-numpy BMP and baseline-TIFF codecs (uncompressed).

The reference ingests scans through ``cv2.imread``
(``/root/reference/modules/image_scraper.py:103-114``), which accepts
BMP and TIFF alongside png/jpg; these two close that format gap for the
multimodal path. Scope matches what scanned-document corpora actually
contain when uncompressed:

- **BMP**: Windows V3 ``BITMAPINFOHEADER``, bottom-up or top-down,
  8-bit paletted (grayscale ramp on encode; any palette folds to luma
  on decode) and 24-bit BGR; BI_RGB (uncompressed) only.
- **TIFF**: little- or big-endian, single image, uncompressed strips,
  8-bit grayscale (PhotometricInterpretation 1) or RGB; strip
  reassembly honors RowsPerStrip/StripOffsets/StripByteCounts.

Decoders return the 2-D uint8 luma plane (the same truncating
0.299/0.587/0.114 fold as the PNG decoder) and raise ``ValueError`` on
anything malformed or oversized — the multimodal quarantine contract.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_PIXELS = 64_000_000

_LUMA = np.array([0.299, 0.587, 0.114])


def _fold(rgb: np.ndarray) -> np.ndarray:
    return np.clip(rgb.astype(np.float64) @ _LUMA, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- BMP


def encode_gray_bmp(img: np.ndarray) -> bytes:
    """2-D uint8 -> 8-bit paletted BMP (grayscale ramp, bottom-up)."""
    if img.ndim != 2:
        raise ValueError("encode_gray_bmp expects a 2-D array")
    h, w = img.shape
    pad = (-w) % 4
    rows = np.zeros((h, w + pad), dtype=np.uint8)
    rows[:, :w] = img
    pixels = rows[::-1].tobytes()  # bottom-up
    palette = bytes(
        b for v in range(256) for b in (v, v, v, 0)
    )
    off = 14 + 40 + len(palette)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(pixels),
                       2835, 2835, 256, 0)
    head = b"BM" + struct.pack("<IHHI", off + len(pixels), 0, 0, off)
    return head + info + palette + pixels


def encode_rgb_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BGR BMP (bottom-up)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_rgb_bmp expects an (h, w, 3) array")
    h, w, _ = img.shape
    pad = (-(w * 3)) % 4
    rows = np.zeros((h, w * 3 + pad), dtype=np.uint8)
    rows[:, : w * 3] = img[:, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    pixels = rows[::-1].tobytes()
    off = 14 + 40
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels),
                       2835, 2835, 0, 0)
    head = b"BM" + struct.pack("<IHHI", off + len(pixels), 0, 0, off)
    return head + info + pixels


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP stream")
    (off,) = struct.unpack("<I", data[10:14])
    hdr_size, w, h_signed, planes, bpp, comp = struct.unpack(
        "<IiiHHI", data[14:34]
    )
    if hdr_size < 40 or comp != 0:
        raise ValueError("unsupported BMP variant (compressed or pre-V3)")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise ValueError(f"implausible BMP dimensions {w}x{h}")
    if bpp == 8:
        (n_colors,) = struct.unpack("<I", data[46:50])
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data[pal_off : pal_off + 4 * n_colors], dtype=np.uint8
        )
        if pal.size < 4 * n_colors:
            raise ValueError("truncated BMP palette")
        pal_rgb = pal.reshape(-1, 4)[:, 2::-1]  # BGRX -> RGB
        if (pal_rgb[:, 0] == pal_rgb[:, 1]).all() and (
            pal_rgb[:, 1] == pal_rgb[:, 2]
        ).all():  # grayscale palette: exact values, no float fold
            lut = pal_rgb[:, 0].copy()
        else:
            lut = _fold(pal_rgb)
        stride = (w + 3) & ~3
        body = np.frombuffer(data[off : off + stride * h], dtype=np.uint8)
        if body.size < stride * h:
            raise ValueError("truncated BMP pixel data")
        idx = body.reshape(h, stride)[:, :w]
        img = lut[idx]
    elif bpp == 24:
        stride = (w * 3 + 3) & ~3
        body = np.frombuffer(data[off : off + stride * h], dtype=np.uint8)
        if body.size < stride * h:
            raise ValueError("truncated BMP pixel data")
        bgr = body.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        img = _fold(bgr[:, :, ::-1])
    else:
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    return img if top_down else img[::-1].copy()


# --------------------------------------------------------------- TIFF


def _tiff_entry(tag: int, typ: int, count: int, value: int) -> bytes:
    return struct.pack("<HHII", tag, typ, count, value)


def encode_tiff(img: np.ndarray, rows_per_strip: int = 16) -> bytes:
    """uint8 grayscale (2-D) or RGB (h, w, 3) -> little-endian baseline
    TIFF, uncompressed, multiple strips (exercises strip reassembly)."""
    color = img.ndim == 3
    if color and img.shape[2] != 3:
        raise ValueError("encode_tiff expects 2-D gray or (h, w, 3) RGB")
    h, w = img.shape[:2]
    spp = 3 if color else 1
    arr = np.ascontiguousarray(img, dtype=np.uint8).reshape(h, w * spp)
    strips = [
        arr[y : y + rows_per_strip].tobytes()
        for y in range(0, h, rows_per_strip)
    ]
    n = len(strips)
    # layout: header(8) | strip data | [bps array if RGB] | offset/count
    # arrays (if n > 1) | IFD
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    bps_off = pos
    if color:
        pos += 6  # three SHORTs
    arrays = b""
    if n > 1:
        so_off = pos
        arrays += struct.pack(f"<{n}I", *strip_offsets)
        pos += 4 * n
        sc_off = pos
        arrays += struct.pack(f"<{n}I", *(len(s) for s in strips))
        pos += 4 * n
    ifd_off = pos
    entries = [
        _tiff_entry(256, 3, 1, w),           # ImageWidth
        _tiff_entry(257, 3, 1, h),           # ImageLength
        (_tiff_entry(258, 3, 3, bps_off) if color
         else _tiff_entry(258, 3, 1, 8)),    # BitsPerSample
        _tiff_entry(259, 3, 1, 1),           # Compression: none
        _tiff_entry(262, 3, 1, 2 if color else 1),  # Photometric
        (_tiff_entry(273, 4, n, so_off) if n > 1
         else _tiff_entry(273, 4, 1, strip_offsets[0])),
        _tiff_entry(277, 3, 1, spp),         # SamplesPerPixel
        _tiff_entry(278, 3, 1, rows_per_strip),
        (_tiff_entry(279, 4, n, sc_off) if n > 1
         else _tiff_entry(279, 4, 1, len(strips[0]))),
    ]
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + b"\x00" * 4
    out = b"II*\x00" + struct.pack("<I", ifd_off) + b"".join(strips)
    if color:
        out += struct.pack("<HHH", 8, 8, 8)
    return out + arrays + ifd


def decode_tiff(data: bytes) -> np.ndarray:
    if data[:4] == b"II*\x00":
        e = "<"
    elif data[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF stream")
    (ifd_off,) = struct.unpack(e + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise ValueError("truncated TIFF IFD")
    (n_entries,) = struct.unpack(e + "H", data[ifd_off : ifd_off + 2])
    if n_entries > 512:
        raise ValueError("implausible TIFF entry count")
    tags: dict[int, tuple[int, int, bytes]] = {}
    for i in range(n_entries):
        p = ifd_off + 2 + 12 * i
        if p + 12 > len(data):
            raise ValueError("truncated TIFF IFD entry")
        tag, typ, count = struct.unpack(e + "HHI", data[p : p + 8])
        tags[tag] = (typ, count, data[p + 8 : p + 12])

    def values(tag: int, default=None) -> list[int]:
        if tag not in tags:
            if default is None:
                raise ValueError(f"TIFF missing tag {tag}")
            return [default]
        typ, count, raw = tags[tag]
        size = {1: 1, 3: 2, 4: 4}.get(typ)
        if size is None:
            raise ValueError(f"unsupported TIFF type {typ}")
        total = size * count
        if total <= 4:
            buf = raw[:total]
        else:
            (off,) = struct.unpack(e + "I", raw)
            buf = data[off : off + total]
            if len(buf) < total:
                raise ValueError("truncated TIFF value array")
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        return list(struct.unpack(e + fmt * count, buf))

    w = values(256)[0]
    h = values(257)[0]
    if w * h == 0 or w * h > MAX_PIXELS:
        raise ValueError(f"implausible TIFF dimensions {w}x{h}")
    if values(259, 1)[0] != 1:
        raise ValueError("compressed TIFF unsupported")
    spp = values(277, 1)[0]
    bps = values(258, 8)
    if spp not in (1, 3) or any(b != 8 for b in bps):
        raise ValueError("unsupported TIFF sample layout")
    offsets = values(273)
    counts = values(279)
    if len(offsets) != len(counts):
        raise ValueError("TIFF strip table mismatch")
    buf = bytearray()
    for off, cnt in zip(offsets, counts):
        chunk = data[off : off + cnt]
        if len(chunk) < cnt:
            raise ValueError("truncated TIFF strip")
        buf.extend(chunk)
    need = h * w * spp
    if len(buf) < need:
        raise ValueError("TIFF pixel data short")
    arr = np.frombuffer(bytes(buf[:need]), dtype=np.uint8)
    if spp == 1:
        img = arr.reshape(h, w)
        if values(262, 1)[0] == 0:  # WhiteIsZero
            img = 255 - img
        return img
    return _fold(arr.reshape(h, w, 3))
