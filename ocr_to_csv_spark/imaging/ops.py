"""Vectorized numpy image operations (native reimplementation of the
reference's OpenCV usage — see SURVEY.md §2.8 X1-X7).

Reference behaviors reimplemented (semantics, not code):
- grayscale convert            (reference modules/image_scraper.py:18)
- Otsu binarization            (reference modules/image_scraper.py:19-20)
- inversion 255-x              (reference modules/image_scraper.py:21)
- 1-D erode/dilate line masks  (reference modules/image_scraper.py:31-52)
- connected components + bboxes(reference modules/image_scraper.py:76-81)
- ink fill ratio               (reference modules/image_scraper.py:148-157,
                                reference modules/corrections.py:614-632)
- grid line-pair recovery      (reference modules/image_scraper.py:183-273)

All functions operate on 2-D uint8 arrays (grayscale, 255=white) unless
noted. 3-channel inputs are accepted where the reference accepted BGR.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# color / threshold
# --------------------------------------------------------------------------

# BGR weights matching the common luma transform (the reference relied on
# cv2.COLOR_BGR2GRAY); our corpus is grayscale so this is a passthrough.
_BGR_WEIGHTS = np.array([0.114, 0.587, 0.299])
_BIN_IDX = np.arange(256)
_U8_255 = np.uint8(255)
_U8_0 = np.uint8(0)


def to_gray(img: np.ndarray) -> np.ndarray:
    """Grayscale view of a 2-D (passthrough) or 3-D BGR uint8 image."""
    if img.ndim == 2:
        return img
    return np.clip(img.astype(np.float64) @ _BGR_WEIGHTS, 0, 255).astype(np.uint8)


def otsu_threshold(gray: np.ndarray) -> int:
    """Otsu's optimal threshold over the 256-bin histogram.

    Maximizes inter-class variance; ties resolve to the lowest threshold
    (same convention as OpenCV). Returns t; binarize with ``gray > t``.
    """
    hist = np.bincount(gray.ravel(), minlength=256)
    total = int(hist.sum())
    if total == 0:
        return 0
    omega = np.cumsum(hist) / total                     # class-0 mass
    mu = np.cumsum(hist * _BIN_IDX) / total             # cumulative mean
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    # where denom == 0 the numerator is exactly 0 too (omega ∈ {0, 1} ⇒
    # mu == mu_t·omega), so a tiny-denominator floor is exact and avoids
    # the slow errstate context + where pass
    sigma_b = (mu_t * omega - mu) ** 2 / np.maximum(denom, 1e-300)
    return int(np.argmax(sigma_b))


def binarize_otsu(gray: np.ndarray) -> np.ndarray:
    """THRESH_BINARY|OTSU analogue: 255 where gray > t_otsu else 0."""
    t = otsu_threshold(gray)
    return np.where(gray > t, _U8_255, _U8_0)  # uint8 out, one alloc


def binarize_inv_fixed(gray: np.ndarray, thresh: int) -> np.ndarray:
    """THRESH_BINARY_INV analogue: 255 where gray <= thresh else 0."""
    return np.where(gray > thresh, 0, 255).astype(np.uint8)


def invert(img: np.ndarray) -> np.ndarray:
    return (255 - img).astype(np.uint8)


def ink_mask(img: np.ndarray) -> np.ndarray:
    """Boolean mask of ink pixels: gray → Otsu binary → inverted."""
    return binarize_otsu(to_gray(img)) == 0


# --------------------------------------------------------------------------
# morphology (separable min/max filters)
# --------------------------------------------------------------------------


def _slide_extreme(img: np.ndarray, k: int, axis: int, pad_val: int, take_min: bool) -> np.ndarray:
    """Sliding min/max of length k along axis (uint8), output same shape.

    n iterations of a length-k erosion/dilation equal one pass with an
    effective kernel of length n*(k-1)+1, so callers pass the effective k.

    Sparse-table scheme: build power-of-two window extrema by doubling
    (log2 k passes of elementwise min/max), then combine two overlapping
    blocks for the final window — O(n log k) instead of O(n k), ~10×
    faster than a materialized sliding_window_view reduction on page-sized
    masks (the mega-page skew critical path).
    """
    if k <= 1:
        return img
    anchor = k // 2
    pads = [(0, 0), (0, 0)]
    pads[axis] = (anchor, k - 1 - anchor)
    padded = np.pad(img, pads, mode="constant", constant_values=pad_val)
    op = np.minimum if take_min else np.maximum

    def sl(a: np.ndarray, start: int, stop) -> np.ndarray:
        idx = [slice(None), slice(None)]
        idx[axis] = slice(start, stop)
        return a[tuple(idx)]

    m = padded  # m[i] = extreme of padded[i : i+length]
    length = 1
    while length * 2 <= k:
        m = op(sl(m, 0, -length), sl(m, length, None))
        length *= 2
    n_out = img.shape[axis]
    return op(sl(m, 0, n_out), sl(m, k - length, k - length + n_out)).astype(
        np.uint8
    )


def erode_1d(img: np.ndarray, k: int, axis: int, iterations: int = 1) -> np.ndarray:
    """Erode with a 1×k (axis=1) or k×1 (axis=0) rectangular kernel."""
    eff = iterations * (k - 1) + 1
    return _slide_extreme(img, eff, axis, pad_val=255, take_min=True)


def dilate_1d(img: np.ndarray, k: int, axis: int, iterations: int = 1) -> np.ndarray:
    eff = iterations * (k - 1) + 1
    return _slide_extreme(img, eff, axis, pad_val=0, take_min=False)


def line_mask(inverted: np.ndarray, orientation: str, kernel_length: int) -> np.ndarray:
    """Morphological line extraction: erode×3 then dilate×3 with a 1-D
    kernel, keeping only runs of ink at least ~3*(k-1)+1 long in the given
    orientation (reference modules/image_scraper.py:38-52 semantics).

    orientation 'vertical' keeps vertical lines (k×1 kernel ⇒ axis 0).
    """
    axis = 0 if orientation == "vertical" else 1
    out = erode_1d(inverted, kernel_length, axis, iterations=3)
    return dilate_1d(out, kernel_length, axis, iterations=3)


# --------------------------------------------------------------------------
# connected components (run-based union-find; 8-connectivity)
# --------------------------------------------------------------------------


def connected_components(mask: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Bounding boxes (x, y, w, h) of 8-connected foreground components.

    Run-based two-pass labeling: horizontal runs per row are the primitive
    (vectorized extraction), unioned across adjacent rows. Fast for sparse
    structural masks (grids, glyphs) independent of image size.
    """
    fg = np.ascontiguousarray(mask, dtype=np.int8)
    h, w = fg.shape
    if h == 0 or w == 0:
        return []
    parent: list[int] = []

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    # all horizontal runs extracted in ONE vectorized pass: pad a zero
    # column left+right, diff along x; starts/ends come out row-major so a
    # searchsorted gives per-row slices
    pad = np.zeros((h, w + 2), dtype=np.int8)
    pad[:, 1:-1] = fg
    d = np.diff(pad, axis=1)
    # one nonzero pass for starts AND ends (they strictly alternate
    # +1,-1 within each row, starting with +1)
    ny, nx = np.nonzero(d)
    pos = d[ny, nx] == 1
    sy, sx = ny[pos], nx[pos]
    ex = nx[~pos]  # same row order as starts
    row_ptr = np.searchsorted(sy, np.arange(h + 1))

    runs_by_row: list[list[tuple[int, int, int]]] = []
    prev: list[tuple[int, int, int]] = []
    prev_a = prev_b = 0  # slice of the previous row's runs (for fast equality)
    for y in range(h):
        a, b = int(row_ptr[y]), int(row_ptr[y + 1])
        if a == b:
            runs_by_row.append([])
            prev, prev_a, prev_b = [], 0, 0
            continue
        # grid masks repeat identical rows for hundreds of scanlines: when
        # the run layout matches the previous row exactly, reuse its run
        # ids outright — no new union-find entries, no pair matching
        if (
            prev
            and b - a == prev_b - prev_a
            and sx[a:b].tobytes() == sx[prev_a:prev_b].tobytes()
            and ex[a:b].tobytes() == ex[prev_a:prev_b].tobytes()
        ):
            runs_by_row.append(prev)
            prev_a, prev_b = a, b
            continue
        cur: list[tuple[int, int, int]] = []
        j = 0  # two-pointer into prev (both run lists ascend in x)
        np_prev = len(prev)
        for x0, x1 in zip(sx[a:b].tolist(), ex[a:b].tolist()):
            rid = len(parent)
            parent.append(rid)
            # 8-connectivity: a prev-row run touches if intervals overlap
            # when widened by one pixel on each side. prev runs ending
            # left of this run can never touch a later (farther-right)
            # run either, so the left pointer advances monotonically —
            # O(runs) per row pair instead of O(runs²).
            while j < np_prev and prev[j][1] + 1 < x0:
                j += 1
            jj = j
            while jj < np_prev and prev[jj][0] <= x1:
                union(prev[jj][2], rid)
                jj += 1
            cur.append((x0, x1 - 1, rid))
        runs_by_row.append(cur)
        prev, prev_a, prev_b = cur, a, b

    # resolve every run's root ONCE (identical-row reuse makes the same
    # rid appear on hundreds of scanlines; per-appearance find() was the
    # second hot spot of this function)
    roots = [find(i) for i in range(len(parent))]
    boxes: dict[int, list[int]] = {}
    for y, runs in enumerate(runs_by_row):
        for x0, x1, rid in runs:
            root = roots[rid]
            b2 = boxes.get(root)
            if b2 is None:
                boxes[root] = [x0, y, x1, y]
            else:
                if x0 < b2[0]:
                    b2[0] = x0
                if x1 > b2[2]:
                    b2[2] = x1
                b2[3] = y
    return [(b[0], b[1], b[2] - b[0] + 1, b[3] - b[1] + 1) for b in boxes.values()]


# --------------------------------------------------------------------------
# fill ratios (blank / boilerplate predicates F2, F3)
# --------------------------------------------------------------------------


def cell_fill_ratio(img: np.ndarray, border: int = 8) -> float:
    """Ink fraction of a cell interior after stripping an 8px border,
    via Otsu-inverted counting (reference modules/corrections.py:614-628).
    Returns 0.0 for degenerate (≤2*border sized) cells."""
    g = to_gray(img)
    core = g[border:-border, border:-border] if border else g
    if core.size == 0:
        return 0.0
    inv = invert(binarize_otsu(core))
    return float(np.count_nonzero(inv)) / float(inv.size)


def box_fill_ratio(img: np.ndarray, thresh: int = 230) -> float:
    """Dark-pixel fraction under a fixed inverse threshold — the reference's
    date-box "is it text?" measure (reference modules/image_scraper.py:148-156)."""
    g = to_gray(img)
    inv = binarize_inv_fixed(g, thresh)
    if inv.size == 0:
        return 0.0
    return float(np.count_nonzero(inv)) / float(inv.size)


# --------------------------------------------------------------------------
# table-grid recovery (Hough-style via projections)
# --------------------------------------------------------------------------


def grid_line_spans(inverted: np.ndarray, orientation: str, min_frac: float = 0.9) -> list[tuple[int, int]]:
    """Positions of full-length grid lines as (start, end_exclusive) spans.

    A vertical grid line is a maximal group of adjacent columns whose ink
    count spans ≥ min_frac of the image height (the reference required
    contour height ≥ 0.9*table height, reference modules/image_scraper.py:206,259).
    Projection profiling replaces morphology+contours: equivalent on
    axis-aligned grids and fully vectorized.
    """
    fg = inverted > 0
    if orientation == "vertical":
        counts = fg.sum(axis=0)
        full = counts >= min_frac * fg.shape[0]
    else:
        counts = fg.sum(axis=1)
        full = counts >= min_frac * fg.shape[1]
    if not full.any():
        return []
    d = np.diff(np.concatenate(([0], full.view(np.uint8), [0])))
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    return [(int(s), int(e)) for s, e in zip(starts, ends)]


def interior_pairs(spans: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Cell-interior intervals between consecutive grid lines.

    Mirrors the reference's point-pairing: flatten each line's (start, end)
    into a sorted point list, drop the outer margins (first and last point),
    pair the rest consecutively (reference modules/image_scraper.py:209-218).
    """
    points: list[int] = []
    for s, e in sorted(spans):
        points.append(s)
        points.append(e)
    if len(points) < 4:
        return []
    points = points[1:-1]
    return [(points[i], points[i + 1]) for i in range(0, len(points) - 1, 2)]
