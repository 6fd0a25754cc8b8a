"""Per-cell classification: blank short-circuit → native OCR → matcher
dispatch (reference modules/corrections.py:584-681 semantics).

The reference runs 3 Tesseract preprocessing variants per cell; the native
classifier is deterministic, so the three "variants" are three copies of
one lattice — preserving the matchers' 3-output cross-boost arithmetic
(J4) and the reference's decision thresholds while paying for OCR once.
"""

from __future__ import annotations

import numpy as np

from ..imaging import ocr, ops
from .lattice import deep_copy
from .matchers import match_hour, match_name, match_purpose, match_time

CellValue = tuple  # (text, prob, accepted)

BLANK_FILL = 0.01
N_VARIANTS = 3


def is_blank_cell(image: np.ndarray) -> bool:
    """≤1% ink after stripping an 8px border (reference
    modules/corrections.py:614-628) — the OCR-input pruning fast path F3."""
    if image.shape[0] <= 16 or image.shape[1] <= 16:
        return True
    return ops.cell_fill_ratio(image, border=8) <= BLANK_FILL


def correct_cell(
    image: np.ndarray,
    column: int,
    names: list,
    purposes: list,
    threshold: float = -1,
) -> CellValue:
    """Classify one cell image given its table column (1-5).

    Returns the reference's (text, prob, accepted) triple
    (reference modules/corrections.py:673-681 dispatch).
    """
    thr = 0.0 if threshold == -1 else threshold
    if is_blank_cell(image):
        return ("", 0, True)

    base = ocr.image_to_lattice(image)
    outputs = [deep_copy(base) for _ in range(N_VARIANTS)]

    if not any(bool(o) for o in outputs):
        return ("NaN", 0, False)

    if column == 1:
        return match_name(outputs, names, threshold=thr)
    if column in (2, 3):
        return match_time(outputs, threshold=thr)
    if column == 4:
        return match_hour(outputs, threshold=thr)
    if column == 5:
        return match_purpose(outputs, purposes, threshold=thr)
    return ("NaN", 0, False)


def read_date_box(image: np.ndarray) -> str:
    """Plain-text OCR of a date/day box with whitespace stripped
    (reference main.py:175-176)."""
    return ocr.image_to_text(image).replace("\n", "").replace(" ", "")
