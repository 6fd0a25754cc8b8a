"""Audio modality: real WAV (RIFF PCM) decode as a multimodal column
path — the audio counterpart of ``multimodal.media_features``.

WAV/PCM needs no codec library (stdlib ``wave`` + a numpy frombuffer),
so unlike video frame-sampling this path is fully implemented: blobs
decode inside an Arrow-batched ``mapInPandas`` stage to integer-exact
features (sample counts, duration, energy, zero crossings — no floats,
so the golden oracle matches bit-for-bit). Corrupt or truncated blobs
yield ``fmt='corrupt_wav'`` rows (the quarantine contract shared with
the image/PDF decoders) — never a task failure.

Compressed audio (mp3/aac/...) stays out of scope for the same reason
video does: no AV codec library in this environment; such blobs sniff
as unknown and quarantine via ``multimodal.quarantine_undecodable``.
"""

from __future__ import annotations

import io
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_SCHEMA = (
    "media_ref string, fmt string, sample_rate int, n_channels int, "
    "n_samples long, duration_ms long, energy long, zero_crossings long"
)


def synth_wav(seed: int, sr: int = 8000, n: int = 4000, channels: int = 1):
    """Deterministic int16 test tone (sine + hash-seeded noise). Returns
    (wav_bytes, expected_feature_row) — the expectation is computed from
    the RAW samples before encoding, so the decode path must reproduce
    them exactly (PCM is lossless)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    freq = 200 + (seed % 17) * 40
    x = 0.5 * np.sin(2 * np.pi * freq * t / sr) + 0.1 * rng.standard_normal(n)
    samples = np.clip(x * 32767, -32768, 32767).astype(np.int16)
    if channels == 2:
        samples = np.column_stack([samples, samples[::-1]]).ravel()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(samples.tobytes())
    data = buf.getvalue()
    ch0 = samples[::channels].astype(np.int64)
    expected = {
        "media_ref": f"wav-{seed}",
        "fmt": "wav",
        "sample_rate": sr,
        "n_channels": channels,
        "n_samples": n,
        "duration_ms": n * 1000 // sr,
        "energy": int((ch0 * ch0).sum()),
        "zero_crossings": int(((ch0[:-1] >= 0) != (ch0[1:] >= 0)).sum()),
    }
    return data, expected


def _decode_one(ref: str, data: bytes) -> tuple:
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            sr = w.getframerate()
            ch = w.getnchannels()
            width = w.getsampwidth()
            nf = w.getnframes()
            raw = w.readframes(nf)
        if width != 2:
            raise ValueError(f"unsupported sample width {width}")
        samples = np.frombuffer(raw, dtype=np.int16)
        if samples.size != nf * ch:  # truncated body
            raise ValueError("truncated PCM payload")
        ch0 = samples[::ch].astype(np.int64)
        return (
            ref, "wav", sr, ch, nf, nf * 1000 // sr,
            int((ch0 * ch0).sum()),
            int(((ch0[:-1] >= 0) != (ch0[1:] >= 0)).sum()),
        )
    except Exception:
        return (ref, "corrupt_wav", -1, -1, -1, -1, -1, -1)


def _audio_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["media_ref", "fmt", "sample_rate", "n_channels", "n_samples",
            "duration_ms", "energy", "zero_crossings"]
    dtypes = {"sample_rate": "int32", "n_channels": "int32",
              "n_samples": "int64", "duration_ms": "int64",
              "energy": "int64", "zero_crossings": "int64"}
    for pdf in it:
        recs = [
            _decode_one(ref, bytes(content))
            for ref, content in zip(pdf["media_ref"], pdf["content"])
        ]
        yield pd.DataFrame(
            {
                c: pd.Series([r[i] for r in recs], dtype=dtypes.get(c, "object"))
                for i, c in enumerate(cols)
            }
        )


def audio_features(media: DataFrame) -> DataFrame:
    """(media_ref, content:binary) → integer-exact per-blob WAV features.
    Arrow-batched mapInPandas, one decode per blob; partitioning follows
    the input (repartition upstream for blob-heavy corpora, as the image
    segment stage does)."""
    return media.select("media_ref", "content").mapInPandas(
        _audio_batches, schema=AUDIO_SCHEMA
    )


AUDIO_SIG_BINS = 64  # energy-envelope signature dimensionality
AUDIO_SIG_SCHEMA = "media_ref string, feat array<double>"


def decode_pcm_ch0(data: bytes):
    """First-channel int64 PCM samples, or None for undecodable blobs —
    the same decode contract as ``_decode_one`` (16-bit only, truncated
    payload = corrupt)."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            ch = w.getnchannels()
            width = w.getsampwidth()
            nf = w.getnframes()
            raw = w.readframes(nf)
        if width != 2:
            return None
        samples = np.frombuffer(raw, dtype=np.int16)
        if samples.size != nf * ch:
            return None
        return samples[::ch].astype(np.int64)
    except Exception:
        return None


def audio_signature_np(ch0: np.ndarray) -> np.ndarray:
    """64-bin energy-envelope signature: sum |sample| per equal time
    slice (tail slice padded by integer bin edges). Integer-exact —
    int64 sums represented exactly as doubles at test scales — so the
    DuckDB oracle recomputes the downstream LSH bit-for-bit."""
    n = ch0.size
    edges = [(i * n) // AUDIO_SIG_BINS for i in range(AUDIO_SIG_BINS + 1)]
    out = np.zeros(AUDIO_SIG_BINS, dtype=np.int64)
    a = np.abs(ch0)
    for i in range(AUDIO_SIG_BINS):
        out[i] = a[edges[i]:edges[i + 1]].sum()
    return out


def _sig_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        refs, feats = [], []
        for ref, content in zip(pdf["media_ref"], pdf["content"]):
            ch0 = decode_pcm_ch0(bytes(content))
            if ch0 is None or ch0.size == 0:  # corrupt blobs quarantine
                continue  # via audio_features; no signature row
            refs.append(ref)
            feats.append([float(x) for x in audio_signature_np(ch0)])
        # object dtype: an all-corrupt batch yields EMPTY columns, and a
        # default float64 empty ndarray breaks Arrow's list<double> path
        yield pd.DataFrame(
            {
                "media_ref": pd.Series(refs, dtype="object"),
                "feat": pd.Series(feats, dtype="object"),
            }
        )


def audio_signatures(media: DataFrame) -> DataFrame:
    """(media_ref, content:binary) → 64-dim energy-envelope signature
    per DECODABLE blob (corrupt blobs are dropped here and quarantined
    by ``audio_features``). Feeds ``multimodal.media_near_dup`` with
    dims=AUDIO_SIG_BINS — the same banded hyperplane LSH plan as image
    and video near-dup, no cross join."""
    return media.select("media_ref", "content").mapInPandas(
        _sig_batches, schema=AUDIO_SIG_SCHEMA
    )
