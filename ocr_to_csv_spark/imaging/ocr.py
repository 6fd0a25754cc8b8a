"""Native OCR: glyph segmentation + template classification → char lattice.

Replaces the reference's per-cell Tesseract subprocess fan-out
(reference modules/corrections.py:636-657, 3 subprocess launches per cell)
with an in-process numpy classifier over the shared bitmap font. The output
shape is the reference's hOCR lattice (reference modules/corrections.py:59-123):

    lattice :: list[word] ; word :: list[charslot] ; charslot :: dict[char, prob]

Probabilities are clamped to [0.01, 1.0] like the reference's
``max(conf, 1)/100`` floor (reference modules/corrections.py:104-105).
"""

from __future__ import annotations

import numpy as np

from . import ops
from .font import CROPPED, GLYPH_H

Lattice = list[list[dict[str, float]]]

# keep a candidate when its match score is within this band of the best
_CAND_BAND = 0.22
_MAX_CANDIDATES = 4


_IDX_CACHE: dict[tuple[int, int, int, int], tuple[np.ndarray, np.ndarray]] = {}


def _resize_mean(mask: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Area-style resample of a boolean mask to (th, tw) floats in [0,1]
    via 4× supersampled nearest-neighbor then block mean — deterministic
    and ratio-agnostic. Gather indices are cached per (input, target)
    shape pair (glyph sizes repeat heavily)."""
    h, w = mask.shape
    ss = 4
    key = (h, w, th, tw)
    idx = _IDX_CACHE.get(key)
    if idx is None:
        ys = (np.arange(th * ss) + 0.5) * h / (th * ss)
        xs = (np.arange(tw * ss) + 0.5) * w / (tw * ss)
        idx = (
            np.minimum(ys.astype(np.int64), h - 1)[:, None],
            np.minimum(xs.astype(np.int64), w - 1)[None, :],
        )
        if len(_IDX_CACHE) < 65536:
            _IDX_CACHE[key] = idx
    samp = mask[idx[0], idx[1]].astype(np.float64)
    # sum * (1/ss²) == block mean exactly (ss² is a power of two)
    return samp.reshape(th, ss, tw, ss).sum(axis=(1, 3)) * (1.0 / (ss * ss))


# templates grouped by cropped shape: one observation resample per
# distinct shape + one vectorized agreement over the whole stack, instead
# of a per-template Python loop (the classify hot path — §2.10 ocr_cell)
_SHAPE_GROUPS: dict[tuple[int, int], tuple[list[str], np.ndarray]] = {}
for _ch, _tmpl in CROPPED.items():
    _chars, _stack = _SHAPE_GROUPS.setdefault(_tmpl.shape, ([], []))  # type: ignore[arg-type]
    _chars.append(_ch)
    _stack.append(_tmpl.astype(np.float64))
_SHAPE_GROUPS = {
    shape: (chars, np.stack(stack))
    for shape, (chars, stack) in _SHAPE_GROUPS.items()
}


# memoization of glyph classification keyed on the exact pixel pattern:
# machine-rendered corpora repeat a tiny set of distinct glyph bitmaps, so
# hit rates are ~99%; scanned inputs just see a bounded cache (exactness
# unaffected — same pixels in, same candidates out)
_GLYPH_CACHE: dict[bytes, dict[str, float]] = {}
_GLYPH_CACHE_MAX = 16384


def classify_glyph(mask: np.ndarray) -> dict[str, float]:
    """Score a cropped glyph mask against every font template.

    Score = mean pixel agreement after resampling the observation to each
    template's cropped shape, damped by aspect-ratio mismatch. Returns the
    best candidate plus look-alikes within the candidate band.
    """
    h, w = mask.shape
    if h == 0 or w == 0:
        return {}
    key = np.array([h, w], dtype=np.int32).tobytes() + np.packbits(mask).tobytes()
    hit = _GLYPH_CACHE.get(key)
    if hit is not None:
        return dict(hit)
    obs_ar = w / h
    scores: dict[str, float] = {}
    for (th, tw), (chars, stack) in _SHAPE_GROUPS.items():
        resized = _resize_mean(mask, th, tw)
        agree = 1.0 - np.abs(resized[None, :, :] - stack).mean(axis=(1, 2))
        t_ar = tw / th
        ar_penalty = min(obs_ar, t_ar) / max(obs_ar, t_ar)
        damped = agree * (0.5 + 0.5 * ar_penalty)
        for ch, s in zip(chars, damped):
            scores[ch] = float(s)
    best = max(scores.values())
    out = {
        ch: max(0.01, round(min(s, 1.0), 4))
        for ch, s in sorted(scores.items(), key=lambda kv: -kv[1])[:_MAX_CANDIDATES]
        if s >= best - _CAND_BAND
    }
    if len(_GLYPH_CACHE) < _GLYPH_CACHE_MAX:
        _GLYPH_CACHE[key] = dict(out)
    return out


def _glyph_boxes(mask: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Connected components merged into per-glyph boxes.

    Drops frame-like components spanning ≥90% of both dims (box borders in
    date crops) and merges x-overlapping components (multi-part glyphs
    like ':'), returning boxes sorted left-to-right.
    """
    h, w = mask.shape
    comps = [
        b
        for b in ops.connected_components(mask)
        # frame guard + despeckle: ≤2-pixel components are scan noise,
        # never glyph parts (the smallest real part, a colon dot, is
        # 2×2 at the minimum render scale)
        if not (b[2] >= 0.9 * w and b[3] >= 0.9 * h) and b[2] * b[3] > 2
    ]
    if not comps:
        return []
    comps.sort(key=lambda b: b[0])
    merged: list[list[int]] = []
    for x, y, bw, bh in comps:
        if merged and x <= merged[-1][0] + merged[-1][2] - 1:
            m = merged[-1]
            x1 = max(m[0] + m[2], x + bw)
            y1 = max(m[1] + m[3], y + bh)
            m[0] = min(m[0], x)
            m[1] = min(m[1], y)
            m[2] = x1 - m[0]
            m[3] = y1 - m[1]
        else:
            merged.append([x, y, bw, bh])
    return [tuple(m) for m in merged]


def image_to_lattice(img: np.ndarray) -> Lattice:
    """OCR a single-line text image into a word/charslot/prob lattice."""
    mask = ops.ink_mask(img)
    boxes = _glyph_boxes(mask)
    if not boxes:
        return [[]]
    scale = max(1.0, max(b[3] for b in boxes) / GLYPH_H)
    gap_break = 4.5 * scale
    words: list[list[dict[str, float]]] = [[]]
    prev_end = None
    for x, y, bw, bh in boxes:
        if prev_end is not None and (x - prev_end) >= gap_break:
            words.append([])
        glyph = mask[y : y + bh, x : x + bw]
        cand = classify_glyph(glyph)
        if cand:
            words[-1].append(cand)
        prev_end = x + bw
    return [w for w in words if w] or [[]]


def lattice_to_text(lattice: Lattice) -> str:
    """Greedy argmax read-out of a lattice (reference's plain
    ``image_to_string`` analogue for date boxes, reference main.py:175)."""
    words = []
    for word in lattice:
        chars = []
        for slot in word:
            if slot:
                chars.append(max(slot.items(), key=lambda kv: kv[1])[0])
        words.append("".join(chars))
    return " ".join(w for w in words if w)


def image_to_text(img: np.ndarray) -> str:
    return lattice_to_text(image_to_lattice(img))
