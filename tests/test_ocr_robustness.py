"""OCR robustness to scan-like perturbations (SURVEY.md §7.3): sparse
salt-and-pepper noise, grayscale contrast shifts, and font-scale changes
must not break segmentation or classification — the degradations real
scans exhibit that the reference handled via Tesseract."""

import numpy as np
import pytest

from ocr_to_csv_spark.extraction.cells import correct_cell, read_date_box
from ocr_to_csv_spark.imaging import render
from ocr_to_csv_spark.imaging.segment import segment_page

ROWS = [
    ["NO", "NAME", "TIME IN", "TIME OUT", "HOURS", "PURPOSE"],
    ["1", "MARY JONES", "9:15", "11:30", "2", "ROBOTICS"],
    ["2", "FRANK LEE", "1:05", "3:45", "3", "CODING"],
]
NAMES = ["frank lee", "mary jones", "zoe adams"]
PURPOSES = ["chess club", "coding", "robotics"]


def _classify_all(page):
    dates, cells = segment_page(page)
    got = {}
    for r, row in enumerate(cells):
        if r == 0:
            continue
        for c, img in enumerate(row):
            if c == 0:
                continue
            got[(r, c)] = correct_cell(img, c, NAMES, PURPOSES)
    return dates, got


EXPECTED = {
    (1, 1): "mary jones", (1, 2): "9:15", (1, 3): "11:30",
    (1, 4): "2", (1, 5): "robotics",
    (2, 1): "frank lee", (2, 2): "1:05", (2, 3): "3:45",
    (2, 4): "3", (2, 5): "coding",
}


def _assert_all_match(got):
    for key, want in EXPECTED.items():
        text, prob, acc = got[key]
        assert text == want, (key, text, want)


def test_clean_page_baseline():
    page = render.render_page(ROWS, dates=["3/14/2024"])
    dates, got = _classify_all(page)
    assert read_date_box(dates[0]) == "3/14/2024"
    _assert_all_match(got)


def test_sparse_salt_and_pepper_noise():
    page = render.render_page(ROWS, dates=["3/14/2024"])
    rng = np.random.default_rng(7)
    noisy = page.copy()
    # 0.5% salt-and-pepper: isolated pixel flips (10x the typical scan)
    n = int(noisy.size * 0.005)
    ys = rng.integers(0, noisy.shape[0], n)
    xs = rng.integers(0, noisy.shape[1], n)
    noisy[ys, xs] = np.where(rng.random(n) < 0.5, 0, 255).astype(np.uint8)
    dates, got = _classify_all(noisy)
    _assert_all_match(got)


def test_contrast_shift_grayscale():
    page = render.render_page(ROWS)
    # simulate a washed-out scan: ink 70, background 210 (Otsu must adapt)
    washed = np.where(page < 128, 70, 210).astype(np.uint8)
    _, got = _classify_all(washed)
    _assert_all_match(got)


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_font_scale_invariance(scale):
    page = render.render_page(ROWS, scale=scale)
    _, got = _classify_all(page)
    _assert_all_match(got)
