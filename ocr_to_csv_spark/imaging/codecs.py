"""Format sniff + decode dispatch for the binary media column.

The reference accepts ``{jpg, jpeg, png}`` files via ``cv2.imread``
(``/root/reference/modules/image_scraper.py:103-114``); the engine's
equivalents are the pure-numpy codecs in this package. Unsupported or
corrupt blobs raise ``ValueError`` — every caller routes that to the
quarantine sink rather than failing the task.
"""

from __future__ import annotations

import struct

import numpy as np

from . import jpeg as jpegc
from . import png as pngc
from . import netpbm as netpbmc
from . import simple_formats as simplec
from . import gif as gifc
from . import webp as webpc

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_format(data: bytes) -> str:
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:5] == b"%PDF-":
        return "pdf"
    if data[:2] == b"BM" and len(data) >= 54:
        return "bmp"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:2] in (b"P2", b"P3", b"P5", b"P6") and len(data) > 2 \
            and data[2:3] in b" \t\r\n#":
        return "netpbm"
    if data[:4] == b"RIFF":
        if data[8:12] == b"AVI ":
            return "avi"
        if data[8:12] == b"WAVE":
            return "wav"
        if data[8:12] == b"WEBP":
            return "webp"
        return "riff_av"
    return "unknown"


def decode_image(data: bytes) -> np.ndarray:
    """Decode PNG / JPEG (baseline or progressive) / BMP / TIFF bytes to
    a 2-D uint8 grayscale array (color folds to luma)."""
    fmt = sniff_format(data)
    if fmt == "png":
        return pngc.decode(data)
    if fmt == "jpeg":
        return jpegc.decode(data)
    if fmt == "bmp":
        return simplec.decode_bmp(data)
    if fmt == "tiff":
        return simplec.decode_tiff(data)
    if fmt == "webp":
        return webpc.decode(data)
    if fmt == "gif":
        return gifc.decode(data)
    if fmt == "netpbm":
        return netpbmc.decode(data)
    raise ValueError(f"no decoder for format {fmt!r}")


def image_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from the header only — no full decode."""
    fmt = sniff_format(data)
    if fmt == "png":
        w, h = struct.unpack(">II", data[16:24])
        return int(w), int(h)
    if fmt == "jpeg":
        # scan markers for SOF0/1 (baseline) or SOF2 (progressive)
        pos = 2
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                pos += 1
                continue
            marker = data[pos + 1]
            if marker in (0xC0, 0xC1, 0xC2):
                _, h, w = struct.unpack(">BHH", data[pos + 4 : pos + 9])
                return int(w), int(h)
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            pos += 2 + length
        raise ValueError("no SOF in JPEG stream")
    if fmt == "bmp":
        w, h = struct.unpack("<ii", data[18:26])
        return int(w), abs(int(h))
    if fmt == "tiff":
        # full IFD walk (cheap — uncompressed baseline only)
        img = simplec.decode_tiff(data)
        return int(img.shape[1]), int(img.shape[0])
    if fmt == "webp":
        return webpc.dims(data)
    if fmt == "gif":
        return gifc.dims(data)
    if fmt == "netpbm":
        return netpbmc.dims(data)
    raise ValueError(f"no header parser for format {fmt!r}")
