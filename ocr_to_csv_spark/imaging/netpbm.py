"""Pure-numpy netpbm (PGM/PPM, ascii P2/P3 and binary P5/P6) codec.

Scanned-document archives and OCR toolchains exchange netpbm
constantly (it is pnm that ``cv2.imread`` — the reference's reader,
``image_scraper.py:103-114`` — and every scanner frontend emit as the
lossless intermediate), so the multimodal path sniffs and decodes it
like the other still formats. Scope:

- P2/P5 grayscale and P3/P6 RGB, maxval 1..65535 (16-bit folds to
  8-bit by the scale factor 255/maxval, truncating — deterministic).
- Comments (``#`` to end of line) legal anywhere in the header.
- RGB folds to luma with the package-standard truncating
  0.299/0.587/0.114 weights.
- Anything malformed (bad magic, truncated raster, maxval 0) raises
  ``ValueError`` — the quarantine contract.
"""

from __future__ import annotations

import numpy as np

_MAGICS = {b"P2": ("ascii", 1), b"P3": ("ascii", 3),
           b"P5": ("raw", 1), b"P6": ("raw", 3)}


def _header_tokens(data: bytes, n: int) -> tuple[list[int], int]:
    """First n whitespace-separated integer tokens after the magic,
    honoring # comments; returns (tokens, offset past final token's
    single trailing whitespace byte)."""
    toks: list[int] = []
    i = 2
    cur = b""
    while i < len(data):
        c = data[i : i + 1]
        if c == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            i += 1
            continue
        if c in b" \t\r\n":
            if cur:
                toks.append(int(cur))
                cur = b""
                if len(toks) == n:
                    return toks, i + 1
            i += 1
            continue
        if not c.isdigit():
            raise ValueError(f"netpbm: bad header byte {c!r}")
        cur += c
        i += 1
    raise ValueError("netpbm: truncated header")


def decode(data: bytes) -> np.ndarray:
    """PGM/PPM bytes → 2-D uint8 luma array (module docstring)."""
    magic = data[:2]
    if magic not in _MAGICS:
        raise ValueError(f"netpbm: bad magic {magic!r}")
    mode, nchan = _MAGICS[magic]
    (w, h, maxval), off = _header_tokens(data, 3)
    if w <= 0 or h <= 0 or not (1 <= maxval <= 65535):
        raise ValueError(f"netpbm: bad dimensions {w}x{h} maxval {maxval}")
    need = w * h * nchan
    if mode == "ascii":
        vals = data[off:].split()
        if len(vals) < need:
            raise ValueError("netpbm: truncated ascii raster")
        arr = np.array([int(v) for v in vals[:need]], dtype=np.int64)
    else:
        wide = maxval > 255
        bytes_needed = need * (2 if wide else 1)
        raster = data[off : off + bytes_needed]
        if len(raster) < bytes_needed:
            raise ValueError("netpbm: truncated raster")
        dt = ">u2" if wide else np.uint8
        arr = np.frombuffer(raster, dtype=dt).astype(np.int64)
    if (arr > maxval).any() or (arr < 0).any():
        raise ValueError("netpbm: sample exceeds maxval")
    arr = (arr * 255) // maxval  # scale to 8-bit, truncating
    if nchan == 1:
        return arr.reshape(h, w).astype(np.uint8)
    rgb = arr.reshape(h, w, 3)
    luma = (
        rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114
    ) // 1000
    return luma.astype(np.uint8)


def dims(data: bytes) -> tuple[int, int]:
    if data[:2] not in _MAGICS:
        raise ValueError("netpbm: bad magic")
    (w, h, _), _ = _header_tokens(data, 3)
    return int(w), int(h)


def encode_gray(img: np.ndarray, binary: bool = True) -> bytes:
    """Encode a 2-D uint8 array as P5 (binary) or P2 (ascii) PGM —
    fixture generator for tests/golden media."""
    h, w = img.shape
    if binary:
        return b"P5\n# pgm fixture\n%d %d\n255\n" % (w, h) + img.astype(
            np.uint8
        ).tobytes()
    body = "\n".join(
        " ".join(str(int(v)) for v in row) for row in img
    )
    return (f"P2\n{w} {h}\n255\n{body}\n").encode()


def encode_rgb(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary P6 PPM."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_rgb expects (h, w, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()
