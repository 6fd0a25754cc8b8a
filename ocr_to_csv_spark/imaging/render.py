"""Deterministic sign-in-sheet page renderer (fixture generator backend).

Produces page images in the layout the reference's fixtures use
(reference docs/signinSheetRequirements.md:4-11): an unbroken black table
grid with a header row + '#' column, optional date boxes outside the
table, optional boilerplate decoys (empty frames / dark blobs) that the
segmentation stage must strip. Rendering uses the shared bitmap font so
the native OCR round-trip is exact.
"""

from __future__ import annotations

import numpy as np

from . import ops
from .font import GLYPH_H, PITCH, render_text

LINE_T = 2          # grid/border line thickness, px
CELL_PAD_X = 10
CELL_PAD_Y = 18     # keeps ink clear of the blank-check's 8px border strip and
                    # keeps even 2-row tables ≥100px tall so grid lines clear
                    # the 0.9 span fraction after the ±5 crop margin
PAGE_MARGIN = 24
DATE_AREA_H = 80


def _blit(canvas: np.ndarray, img: np.ndarray, y: int, x: int) -> None:
    h, w = img.shape
    region = canvas[y : y + h, x : x + w]
    np.minimum(region, img, out=region)


def _rect(canvas: np.ndarray, y: int, x: int, h: int, w: int, t: int = LINE_T) -> None:
    canvas[y : y + t, x : x + w] = 0
    canvas[y + h - t : y + h, x : x + w] = 0
    canvas[y : y + h, x : x + t] = 0
    canvas[y : y + h, x + w - t : x + w] = 0


def render_page(
    table_rows: list[list[str]],
    dates: list[str] | None = None,
    scale: int = 2,
    decoy_frame: bool = False,
    decoy_blob: bool = False,
) -> np.ndarray:
    """Render one page: grid table with the given rows (row 0 = header),
    optional date boxes above the table, optional decoys."""
    dates = dates or []
    n_rows = len(table_rows)
    n_cols = len(table_rows[0])

    col_w = [
        max(3 * PITCH, max(len(r[c]) for r in table_rows) * PITCH) * scale
        + 2 * CELL_PAD_X
        for c in range(n_cols)
    ]
    row_h = GLYPH_H * scale + 2 * CELL_PAD_Y
    table_w = sum(col_w) + (n_cols + 1) * LINE_T
    table_h = n_rows * row_h + (n_rows + 1) * LINE_T

    page_w = max(table_w + 2 * PAGE_MARGIN, 700)
    # decoy "crop mark": an L-shaped 1px graphic below the table whose
    # bounding-box ink fill is ≤1% — the "too empty" side of the reference's
    # keep-window — sized strictly smaller than the table so it can never
    # win the table election. Skipped (no-op) when the table is too small
    # for a feasible ≤1% L.
    arm_v = min(int(0.8 * table_h), 260)
    arm_h = 0
    if decoy_frame and arm_v > 110:
        arm_h = max(arm_v, int((arm_v - 1) / (0.01 * arm_v - 1)) + 2)
        if arm_h > min(int(0.8 * table_w), 400):
            arm_h = 0
    page_h = (
        table_h + DATE_AREA_H + 2 * PAGE_MARGIN + (arm_v + 20 if arm_h else 0)
    )
    page = np.full((page_h, page_w), 255, dtype=np.uint8)
    if arm_h:
        ly = page_h - PAGE_MARGIN - arm_v
        page[ly : ly + arm_v, PAGE_MARGIN] = 0
        page[ly + arm_v - 1, PAGE_MARGIN : PAGE_MARGIN + arm_h] = 0

    # --- date boxes + decoys in the top band -------------------------------
    x_cursor = PAGE_MARGIN
    for dstr in dates:
        txt = render_text(dstr, scale)
        # pad the box so the ink fill (border + text) lands safely inside
        # the reference's (1%, 20%) keep-window (modules/image_scraper.py:148-157):
        # grow padding until fill ≤ 18%
        ink = int((txt < 128).sum())
        pad = 15
        while True:
            bw, bh = txt.shape[1] + 2 * pad, txt.shape[0] + 2 * pad
            border = 2 * LINE_T * (bw + bh) - 4 * LINE_T * LINE_T
            if (ink + border) / (bw * bh) <= 0.18:
                break
            pad += 4
        _rect(page, PAGE_MARGIN, x_cursor, bh, bw)
        _blit(page, txt, PAGE_MARGIN + pad, x_cursor + pad)
        x_cursor += bw + 40
    if decoy_blob:  # solid dark blob → fill ≥20% → must be stripped
        page[PAGE_MARGIN : PAGE_MARGIN + 40, x_cursor : x_cursor + 120] = 0
        x_cursor += 160

    # --- table grid + cell text -------------------------------------------
    ty = PAGE_MARGIN + DATE_AREA_H
    tx = PAGE_MARGIN
    for r in range(n_rows + 1):
        y = ty + r * (row_h + LINE_T)
        page[y : y + LINE_T, tx : tx + table_w] = 0
    for c in range(n_cols + 1):
        x = tx + sum(col_w[:c]) + c * LINE_T
        page[ty : ty + table_h, x : x + LINE_T] = 0

    for r, row in enumerate(table_rows):
        for c, text in enumerate(row):
            if not text:
                continue
            txt = render_text(text, scale)
            cy = ty + LINE_T + r * (row_h + LINE_T) + CELL_PAD_Y
            cx = tx + sum(col_w[:c]) + (c + 1) * LINE_T + CELL_PAD_X
            _blit(page, txt, cy, cx)
    return page


def page_fill_ok(page: np.ndarray) -> bool:
    """Sanity helper: page binarizes with ink present."""
    return bool((ops.ink_mask(page)).any())
