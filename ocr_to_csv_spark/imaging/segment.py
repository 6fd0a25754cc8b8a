"""Page segmentation: one page image → loose date-box crops + table cell matrix.

Native reimplementation of the reference scraper's per-page flow
(reference modules/image_scraper.py:116-300):

1. Otsu-binarize + invert, build vertical/horizontal morphological line
   masks (kernel = width//80, erode×3/dilate×3)   — X4.
2. Connected components of the union mask = candidate boxes; the largest
   is the sign-in table, the rest are date/day boxes  — J5 + table election.
   (The reference used contour containment suppression; run-based CC gives
   outermost structures directly.)
3. Date boxes kept only when dark-pixel fill ∈ (1%, 20%) under a fixed
   230 inverse threshold — the boilerplate/graphic strip  — F2.
4. Table cropped ±5px; grid lines recovered by projection profiling
   (≥90% span), interior pairs sliced row-major into cells — O2/X7.
"""

from __future__ import annotations

import numpy as np

from . import ops


def segment_page(
    page: np.ndarray,
) -> tuple[list[np.ndarray], list[list[np.ndarray]]]:
    """Return (date_box_crops, cell_matrix) for one page image.

    Shapes mirror the reference's per-sheet ``[dates, table]`` structure
    (reference modules/image_scraper.py:143,292-300); the cell matrix
    includes the header row/column — downstream filters skip them (F5).
    """
    gray = ops.to_gray(page)
    h, w = gray.shape
    inv = ops.invert(ops.binarize_otsu(gray))
    kernel_length = max(3, w // 80)

    vmask = ops.line_mask(inv, "vertical", kernel_length)
    hmask = ops.line_mask(inv, "horizontal", kernel_length)
    structure = (vmask > 0) | (hmask > 0)

    comps = [
        b
        for b in ops.connected_components(structure)
        if not (b[2] >= w and b[3] >= h)  # whole-page artifact guard
    ]
    if not comps:
        return [], []

    table_box = max(comps, key=lambda b: b[2] * b[3])
    main_boxes = sorted(
        (b for b in comps if b != table_box), key=lambda b: (b[1], b[0])
    )

    dates: list[np.ndarray] = []
    for x, y, bw, bh in main_boxes:
        crop = page[y : y + bh, x : x + bw]
        fill = ops.box_fill_ratio(crop, thresh=230)
        if 0.01 < fill < 0.20:
            dates.append(crop)

    tx, ty, tw, th = table_box
    y0, y1 = max(0, ty - 5), min(h, ty + th + 5)
    x0, x1 = max(0, tx - 5), min(w, tx + tw + 5)
    tcrop = page[y0:y1, x0:x1]

    t_inv = ops.invert(ops.binarize_otsu(ops.to_gray(tcrop)))
    v_pairs = ops.interior_pairs(ops.grid_line_spans(t_inv, "vertical"))
    h_pairs = ops.interior_pairs(ops.grid_line_spans(t_inv, "horizontal"))

    cells = [
        [tcrop[r0:r1, c0:c1] for (c0, c1) in v_pairs] for (r0, r1) in h_pairs
    ]
    return dates, cells
