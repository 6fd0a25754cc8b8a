"""Deterministic 5×7 bitmap font: single source of truth for both the
corpus renderer (datagen) and the native OCR classifier.

Because render and classify share these glyphs, machine-rendered fixtures
are OCR-deterministic (SURVEY.md §7.3 "Nondeterministic OCR") — the role
Tesseract + real scans play in the reference. Confusable pairs (O/0, I/1,
Z/2, S/5…) intentionally share most pixels so the reference's
confusion-matrix enrichment (reference modules/corrections.py:23-53) has
real work to do.
"""

from __future__ import annotations

import numpy as np

GLYPH_W = 5
GLYPH_H = 7
PITCH = 6  # glyph advance in font pixels (5 + 1 spacing)

_RAW = {
    "A": ".###.|#...#|#...#|#####|#...#|#...#|#...#",
    "B": "####.|#...#|####.|#...#|#...#|#...#|####.",
    "C": ".####|#....|#....|#....|#....|#....|.####",
    "D": "####.|#...#|#...#|#...#|#...#|#...#|####.",
    "E": "#####|#....|####.|#....|#....|#....|#####",
    "F": "#####|#....|####.|#....|#....|#....|#....",
    "G": ".####|#....|#....|#.###|#...#|#...#|.###.",
    "H": "#...#|#...#|#...#|#####|#...#|#...#|#...#",
    "I": "#####|..#..|..#..|..#..|..#..|..#..|#####",
    "J": "..###|...#.|...#.|...#.|...#.|#..#.|.##..",
    "K": "#...#|#..#.|#.#..|##...|#.#..|#..#.|#...#",
    "L": "#....|#....|#....|#....|#....|#....|#####",
    "M": "#...#|##.##|#.#.#|#.#.#|#...#|#...#|#...#",
    "N": "#...#|##..#|#.#.#|#..##|#...#|#...#|#...#",
    "O": ".###.|#...#|#...#|#...#|#...#|#...#|.###.",
    "P": "####.|#...#|#...#|####.|#....|#....|#....",
    "Q": ".###.|#...#|#...#|#...#|#.#.#|#..#.|.##.#",
    "R": "####.|#...#|#...#|####.|#.#..|#..#.|#...#",
    "S": ".####|#....|#....|.###.|....#|....#|####.",
    "T": "#####|..#..|..#..|..#..|..#..|..#..|..#..",
    "U": "#...#|#...#|#...#|#...#|#...#|#...#|.###.",
    "V": "#...#|#...#|#...#|#...#|#...#|.#.#.|..#..",
    "W": "#...#|#...#|#...#|#.#.#|#.#.#|##.##|#...#",
    "X": "#...#|#...#|.#.#.|..#..|.#.#.|#...#|#...#",
    "Y": "#...#|#...#|.#.#.|..#..|..#..|..#..|..#..",
    "Z": "#####|....#|...#.|..#..|.#...|#....|#####",
    "0": ".###.|#...#|#..##|#.#.#|##..#|#...#|.###.",
    "1": "..#..|.##..|..#..|..#..|..#..|..#..|#####",
    "2": ".###.|#...#|....#|...#.|..#..|.#...|#####",
    "3": ".###.|#...#|....#|..##.|....#|#...#|.###.",
    "4": "...#.|..##.|.#.#.|#..#.|#####|...#.|...#.",
    "5": "#####|#....|####.|....#|....#|#...#|.###.",
    "6": "..##.|.#...|#....|####.|#...#|#...#|.###.",
    "7": "#####|....#|...#.|..#..|..#..|.#...|.#...",
    "8": ".###.|#...#|#...#|.###.|#...#|#...#|.###.",
    "9": ".###.|#...#|#...#|.####|....#|...#.|.##..",
    ":": ".....|..#..|..#..|.....|..#..|..#..|.....",
    "/": "....#|....#|...#.|..#..|.#...|#....|#....",
    ".": ".....|.....|.....|.....|.....|.##..|.##..",
    ",": ".....|.....|.....|.....|..#..|..#..|.#...",
    "-": ".....|.....|.....|#####|.....|.....|.....",
}


def _parse(spec: str) -> np.ndarray:
    rows = spec.split("|")
    assert len(rows) == GLYPH_H and all(len(r) == GLYPH_W for r in rows), spec
    return np.array([[c == "#" for c in r] for r in rows], dtype=bool)


GLYPHS: dict[str, np.ndarray] = {ch: _parse(spec) for ch, spec in _RAW.items()}

SUPPORTED = set(GLYPHS) | {" "}


def glyph_bbox(ch: str) -> tuple[int, int, int, int]:
    """(x, y, w, h) of the inked region within the 5×7 box."""
    g = GLYPHS[ch]
    ys, xs = np.nonzero(g)
    return int(xs.min()), int(ys.min()), int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1)


# cropped-to-ink template per glyph, precomputed once for the classifier
CROPPED: dict[str, np.ndarray] = {}
for _ch, _g in GLYPHS.items():
    _x, _y, _w, _h = glyph_bbox(_ch)
    CROPPED[_ch] = _g[_y : _y + _h, _x : _x + _w]


def render_text(text: str, scale: int = 2) -> np.ndarray:
    """Render a single line of text to a 2-D uint8 image (0=ink, 255=bg).

    Unsupported characters raise — the corpus generator only emits
    SUPPORTED characters so OCR round-trips are closed.
    """
    text = text.upper()
    h = GLYPH_H * scale
    w = max(1, PITCH * len(text) * scale)
    img = np.full((h, w), 255, dtype=np.uint8)
    for i, ch in enumerate(text):
        if ch == " ":
            continue
        g = GLYPHS[ch]
        big = np.kron(g, np.ones((scale, scale), dtype=bool))
        x0 = i * PITCH * scale
        img[:, x0 : x0 + GLYPH_W * scale][big] = 0
    return img
