"""Video modality: real AVI (RIFF) container parse + frame decode as a
multimodal column path — the video counterpart of ``extraction.audio``.

Two codecs, both decodable with what the engine already ships (no AV
library in this environment, and none needed):

- **MJPEG** (``MJPG`` fourcc): every ``00dc`` chunk is a standalone
  baseline JPEG, decoded by the in-repo pure-numpy codec
  (``imaging/jpeg.py``) — the same format real scanners/webcams emit.
- **raw grayscale** (``Y800`` fourcc): each frame chunk is exactly
  ``width*height`` luma bytes, so goldens computed from the pre-encode
  arrays are bit-exact (the lossless analogue, like WAV/PCM for audio).

Frame sampling (every Nth frame — the brief's ``sample_frames``) and
feature extraction run inside an Arrow-batched ``mapInPandas`` stage;
features are integer-exact (frame counts, duration, intensity sums, a
motion metric = sum |frame[i+1]-frame[i]| over sampled frames) so the
golden oracle matches bit-for-bit for raw frames, and matches the
deterministic decode for MJPEG (the datagen computes MJPEG goldens by
decoding the encoded bytes, the same convention as JPEG page media in
``datagen/gen.py``). Corrupt or truncated containers yield
``fmt='corrupt_avi'`` rows — the quarantine contract shared with the
image/PDF/WAV decoders — never a task failure.

Reference parity: the reference's scope is still scans via ``cv2.imread``
(``/root/reference/modules/image_scraper.py:103-114``); video columns are
part of the training-data-pipeline surface the brief makes first-class.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..imaging import jpeg as jpegc

VIDEO_SCHEMA = (
    "media_ref string, fmt string, width int, height int, n_frames long, "
    "fps int, duration_ms long, n_sampled long, intensity_sum long, "
    "motion long"
)

# container guard: a corrupt header can declare absurd dimensions or
# frame counts; cap work per blob so hostile input quarantines instead
# of stalling an executor (same contract as jpeg.MAX_PIXELS).
MAX_FRAME_PIXELS = 16_000_000
MAX_FRAMES = 100_000


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """One RIFF chunk: fourcc + size + payload (+ pad byte to even)."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def write_avi(frames: list[bytes], w: int, h: int, fps: int,
              fourcc: bytes) -> bytes:
    """Serialize encoded frame payloads into a spec-shaped AVI: RIFF
    'AVI ' → LIST hdrl (avih + LIST strl(strh vids + strf BITMAPINFO))
    → LIST movi ('00dc' per frame) → idx1. Single video stream."""
    n = len(frames)
    max_len = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I",
        1_000_000 // max(1, fps),  # dwMicroSecPerFrame
        0, 0,
        0x10,                      # AVIF_HASINDEX
        n, 0, 1, max_len, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + fourcc
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, max_len,
                      0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 8,
        fourcc if fourcc != b"Y800" else b"Y800",
        w * h, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks = [_chunk(b"00dc", f) for f in frames]
    movi = _list(b"movi", b"".join(movi_chunks))
    # idx1: (fourcc, flags, offset-from-movi-list-type, size) per frame
    off = 4  # past the 'movi' list-type fourcc
    idx_entries = []
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_len) for chunks in [pos,end)."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def parse_avi(data: bytes) -> tuple[dict, list[bytes]]:
    """Parse an AVI container: header dict (codec fourcc, w, h, fps,
    declared n_frames) + the ordered list of raw frame payloads from the
    movi list. Raises ValueError on anything malformed → quarantine."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI stream")
    hdr: dict = {}
    frames: list[bytes] = []
    for fourcc, p, size in _walk_chunks(data, 12, len(data)):
        if p + size > len(data):
            raise ValueError("truncated AVI chunk")
        if fourcc == b"LIST":
            ltype = data[p : p + 4]
            if ltype == b"hdrl":
                for fc2, p2, s2 in _walk_chunks(data, p + 4, p + size):
                    if fc2 == b"avih":
                        vals = struct.unpack("<14I", data[p2 : p2 + 56])
                        hdr["n_frames"] = vals[4]
                        hdr["width"], hdr["height"] = vals[8], vals[9]
                    elif fc2 == b"LIST" and data[p2 : p2 + 4] == b"strl":
                        for fc3, p3, s3 in _walk_chunks(data, p2 + 4, p2 + s2):
                            if fc3 == b"strh" and data[p3 : p3 + 4] == b"vids":
                                hdr["fourcc"] = data[p3 + 4 : p3 + 8]
                                scale, rate = struct.unpack(
                                    "<II", data[p3 + 20 : p3 + 28]
                                )
                                hdr["fps"] = rate // max(1, scale)
            elif ltype == b"movi":
                for fc2, p2, s2 in _walk_chunks(data, p + 4, p + size):
                    if fc2[2:4] in (b"dc", b"db"):
                        if p2 + s2 > len(data):
                            raise ValueError("truncated frame chunk")
                        frames.append(data[p2 : p2 + s2])
    for k in ("fourcc", "width", "height", "fps"):
        if k not in hdr:
            raise ValueError(f"AVI header missing {k}")
    if not (0 < hdr["width"] * hdr["height"] <= MAX_FRAME_PIXELS):
        raise ValueError("implausible AVI dimensions")
    if len(frames) > MAX_FRAMES:
        raise ValueError("implausible AVI frame count")
    hdr["n_frames"] = hdr.get("n_frames") or len(frames)
    return hdr, frames


def _decode_frame(payload: bytes, fourcc: bytes, w: int, h: int) -> np.ndarray:
    if fourcc == b"MJPG":
        img = jpegc.decode(payload)
        if img.shape != (h, w):
            raise ValueError("MJPEG frame dims disagree with container")
        return img
    if fourcc == b"Y800":
        if len(payload) != w * h:
            raise ValueError("raw frame payload length mismatch")
        return np.frombuffer(payload, dtype=np.uint8).reshape(h, w)
    raise ValueError(f"unsupported video codec {fourcc!r}")


def sample_frames(data: bytes, every_n: int = 30) -> tuple[dict, list[np.ndarray]]:
    """Decode every ``every_n``-th frame (0, n, 2n, ...) of an AVI blob.
    Returns (header dict, decoded 2-D uint8 frames). This is the brief's
    frame-sampling operator — a real decode, no longer a stub."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    hdr, payloads = parse_avi(data)
    out = [
        _decode_frame(p, hdr["fourcc"], hdr["width"], hdr["height"])
        for p in payloads[::every_n]
    ]
    return hdr, out


_FMT_BY_FOURCC = {b"MJPG": "avi_mjpg", b"Y800": "avi_raw"}


def synth_avi(seed: int, w: int = 48, h: int = 32, n_frames: int = 12,
              fps: int = 10, codec: str = "raw",
              every_n: int = 3) -> tuple[bytes, dict]:
    """Deterministic AVI test fixture: a seed-keyed moving gradient
    (frame f pixel (y,x) = (3x + 5y + 7f + seed) mod 256). Returns
    (avi_bytes, expected_feature_row). For ``raw`` (Y800) the
    expectation comes from the PRE-ENCODE frames (lossless, so decode
    must reproduce them bit-exactly); for ``mjpg`` it comes from the
    deterministic decode of each encoded frame — the same convention the
    datagen uses for lossy JPEG page media (datagen/gen.py)."""
    raw_frames = [
        (
            (3 * np.arange(w)[None, :] + 5 * np.arange(h)[:, None]
             + 7 * f + seed) % 256
        ).astype(np.uint8)
        for f in range(n_frames)
    ]
    if codec == "raw":
        payloads = [f.tobytes() for f in raw_frames]
        decoded = raw_frames
        fourcc, fmt = b"Y800", "avi_raw"
    elif codec == "mjpg":
        payloads = [jpegc.encode_gray(f, quality=92) for f in raw_frames]
        decoded = [jpegc.decode(p) for p in payloads]
        fourcc, fmt = b"MJPG", "avi_mjpg"
    else:
        raise ValueError(f"unknown fixture codec {codec!r}")
    data = write_avi(payloads, w, h, fps, fourcc)
    sampled = decoded[::every_n]
    stack = np.stack(sampled).astype(np.int64)
    expected = {
        "media_ref": f"avi-{codec}-{seed}",
        "fmt": fmt,
        "width": w,
        "height": h,
        "n_frames": n_frames,
        "fps": fps,
        "duration_ms": n_frames * 1000 // fps,
        "n_sampled": len(sampled),
        "intensity_sum": int(stack.sum()),
        "motion": int(np.abs(np.diff(stack, axis=0)).sum())
        if len(sampled) > 1 else 0,
    }
    return data, expected


def _features_one(ref: str, data: bytes, every_n: int) -> tuple:
    try:
        hdr, payloads = parse_avi(data)
        fmt = _FMT_BY_FOURCC.get(hdr["fourcc"])
        if fmt is None:
            raise ValueError("unknown codec")
        frames = [
            _decode_frame(p, hdr["fourcc"], hdr["width"], hdr["height"])
            for p in payloads[::every_n]
        ]
        stack = np.stack(frames).astype(np.int64) if frames else None
        inten = int(stack.sum()) if stack is not None else 0
        motion = (
            int(np.abs(np.diff(stack, axis=0)).sum())
            if stack is not None and len(frames) > 1 else 0
        )
        n_total = len(payloads)
        return (
            ref, fmt, hdr["width"], hdr["height"], n_total, hdr["fps"],
            n_total * 1000 // max(1, hdr["fps"]), len(frames), inten, motion,
        )
    except Exception:
        return (ref, "corrupt_avi", -1, -1, -1, -1, -1, -1, -1, -1)


def _video_batches(every_n: int):
    cols = ["media_ref", "fmt", "width", "height", "n_frames", "fps",
            "duration_ms", "n_sampled", "intensity_sum", "motion"]
    dtypes = {"width": "int32", "height": "int32", "n_frames": "int64",
              "fps": "int32", "duration_ms": "int64", "n_sampled": "int64",
              "intensity_sum": "int64", "motion": "int64"}

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = [
                _features_one(ref, bytes(content), every_n)
                for ref, content in zip(pdf["media_ref"], pdf["content"])
            ]
            yield pd.DataFrame(
                {
                    c: pd.Series([r[i] for r in recs],
                                 dtype=dtypes.get(c, "object"))
                    for i, c in enumerate(cols)
                }
            )

    return gen


def video_features(media: DataFrame, every_n: int = 3) -> DataFrame:
    """(media_ref, content:binary) → integer-exact per-video features
    over every-Nth-frame sampling. Arrow-batched mapInPandas, one
    container parse + sampled decode per blob; partitioning follows the
    input (repartition upstream for blob-heavy corpora, like the image
    segment stage)."""
    return media.select("media_ref", "content").mapInPandas(
        _video_batches(every_n), schema=VIDEO_SCHEMA
    )


# per-video 264-dim signature (same recipe as image media_features:
# 16x16 ink-density thumbnail of the mean sampled frame + 8-bin
# intensity histogram) so video near-dup reuses the banded-LSH path.
SIG_SCHEMA = "media_ref string, feat array<float>"


def video_signature_np(frames: list[np.ndarray]) -> np.ndarray:
    """Deterministic numpy signature shared by the Spark stage AND the
    datagen golden computation (identical code path → bit-exact)."""
    from ..imaging.ocr import _resize_mean

    mean_f = np.mean(np.stack(frames).astype(np.float64), axis=0)
    small = _resize_mean(mean_f < 128, 16, 16)
    hist = np.bincount(
        np.minimum((mean_f.astype(np.int32) * 8) // 256, 7).ravel(),
        minlength=8,
    ).astype(np.float64)
    hist = hist / max(1.0, hist.sum())
    return np.concatenate([small.ravel(), hist]).astype(np.float32)


def _sig_batches(every_n: int):
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            refs, feats = [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    _, frames = sample_frames(bytes(content), every_n)
                    if not frames:
                        continue
                except Exception:
                    continue  # corrupt: quarantined by video_features
                refs.append(ref)
                feats.append(video_signature_np(frames).tolist())
            yield pd.DataFrame(
                {"media_ref": pd.Series(refs, dtype="object"),
                 "feat": pd.Series(feats, dtype="object")}
            )

    return gen


def video_signatures(media: DataFrame, every_n: int = 3) -> DataFrame:
    """Per-video 264-dim feature vector (mean-sampled-frame thumbnail +
    histogram) — the input shape ``multimodal.media_near_dup`` consumes,
    so video near-dup is the same no-cross-join banded-LSH plan."""
    return media.select("media_ref", "content").mapInPandas(
        _sig_batches(every_n), schema=SIG_SCHEMA
    )
