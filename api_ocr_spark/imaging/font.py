"""Deterministic 5x7 bitmap font used by both the fixture renderer and the
glyph OCR engine.

The reference OCRs arbitrary rasters with Tesseract
(/root/reference/ocr/engine.py:21-52); Tesseract is unavailable here, so the
engine's OCR stage is a real template-matching recognizer over this font —
deterministic, environment-independent, and exact by construction (SURVEY.md
§5.2: fixtures are self-verifying, images rendered from known ground truth).

Glyphs are single-case (lowercase keys, uppercase letterforms). All glyphs
occupy a contiguous column span (no internal fully-blank columns), which the
segmenter relies on.
"""

from __future__ import annotations

import numpy as np

# fmt: off
_GLYPHS_RAW: dict[str, str] = {
    "a": ".###.|#...#|#...#|#####|#...#|#...#|#...#",
    "b": "####.|#...#|#...#|####.|#...#|#...#|####.",
    "c": ".###.|#...#|#....|#....|#....|#...#|.###.",
    "d": "####.|#...#|#...#|#...#|#...#|#...#|####.",
    "e": "#####|#....|#....|####.|#....|#....|#####",
    "f": "#####|#....|#....|####.|#....|#....|#....",
    "g": ".###.|#...#|#....|#.###|#...#|#...#|.###.",
    "h": "#...#|#...#|#...#|#####|#...#|#...#|#...#",
    "i": ".###.|..#..|..#..|..#..|..#..|..#..|.###.",
    "j": "..###|...#.|...#.|...#.|...#.|#..#.|.##..",
    "k": "#...#|#..#.|#.#..|##...|#.#..|#..#.|#...#",
    "l": "#....|#....|#....|#....|#....|#....|#####",
    "m": "#...#|##.##|#.#.#|#.#.#|#...#|#...#|#...#",
    "n": "#...#|##..#|#.#.#|#..##|#...#|#...#|#...#",
    "o": ".###.|#...#|#...#|#...#|#...#|#...#|.###.",
    "p": "####.|#...#|#...#|####.|#....|#....|#....",
    "q": ".###.|#...#|#...#|#...#|#.#.#|#..#.|.##.#",
    "r": "####.|#...#|#...#|####.|#.#..|#..#.|#...#",
    "s": ".####|#....|#....|.###.|....#|....#|####.",
    "t": "#####|..#..|..#..|..#..|..#..|..#..|..#..",
    "u": "#...#|#...#|#...#|#...#|#...#|#...#|.###.",
    "v": "#...#|#...#|#...#|#...#|#...#|.#.#.|..#..",
    "w": "#...#|#...#|#...#|#.#.#|#.#.#|##.##|#...#",
    "x": "#...#|#...#|.#.#.|..#..|.#.#.|#...#|#...#",
    "y": "#...#|#...#|.#.#.|..#..|..#..|..#..|..#..",
    "z": "#####|....#|...#.|..#..|.#...|#....|#####",
    "0": ".###.|#...#|#..##|#.#.#|##..#|#...#|.###.",
    "1": "..#..|.##..|..#..|..#..|..#..|..#..|.###.",
    "2": ".###.|#...#|....#|...#.|..#..|.#...|#####",
    "3": ".###.|#...#|....#|..##.|....#|#...#|.###.",
    "4": "...#.|..##.|.#.#.|#..#.|#####|...#.|...#.",
    "5": "#####|#....|####.|....#|....#|#...#|.###.",
    "6": ".###.|#....|#....|####.|#...#|#...#|.###.",
    "7": "#####|....#|...#.|..#..|.#...|.#...|.#...",
    "8": ".###.|#...#|#...#|.###.|#...#|#...#|.###.",
    "9": ".###.|#...#|#...#|.####|....#|....#|.###.",
    ":": ".....|.##..|.##..|.....|.##..|.##..|.....",
    "-": ".....|.....|.....|.###.|.....|.....|.....",
    ".": ".....|.....|.....|.....|.....|.##..|.##..",
    ",": ".....|.....|.....|.....|..##.|..##.|..#..",
    "(": "...#.|..#..|.#...|.#...|.#...|..#..|...#.",
    ")": ".#...|..#..|...#.|...#.|...#.|..#..|.#...",
    "/": "....#|....#|...#.|..#..|.#...|#....|#....",
}
# fmt: on

GLYPH_W = 5
GLYPH_H = 7
SCALE = 2  # rendered glyphs are (GLYPH_H*SCALE) x (GLYPH_W*SCALE)
CELL_W = GLYPH_W * SCALE + 4  # 4 px inter-char gap at render scale
# Line gap (16) must exceed the region-segmenter's dilation reach (2*6=12)
# so lines never merge vertically, while the word gap (space cell ≥ 22 px)
# exceeds it horizontally too — document-like geometry: both gaps > reach,
# and line pitch > any intra-line feature. See kernels/detection.py
# segment_regions and SURVEY.md §2.8.
LINE_H = GLYPH_H * SCALE + 16
CHARSET = set(_GLYPHS_RAW) | {" "}


def _parse(raw: str) -> np.ndarray:
    rows = raw.split("|")
    assert len(rows) == GLYPH_H and all(len(r) == GLYPH_W for r in rows), raw
    return np.array([[c == "#" for c in r] for r in rows], dtype=bool)


GLYPHS: dict[str, np.ndarray] = {ch: _parse(raw) for ch, raw in _GLYPHS_RAW.items()}


_SCALED_CACHE: dict[str, np.ndarray] = {}


def scaled_glyph(ch: str) -> np.ndarray:
    """Glyph bitmap at render scale (bool, (7*SCALE) x (5*SCALE)); memoized."""
    g = _SCALED_CACHE.get(ch)
    if g is None:
        g = np.kron(GLYPHS[ch], np.ones((SCALE, SCALE), dtype=bool))
        _SCALED_CACHE[ch] = g
    return g


def ink_bbox(mask: np.ndarray) -> tuple[int, int, int, int]:
    """(x, y, w, h) of the tight ink bounding box; (0,0,0,0) if blank."""
    ys, xs = np.nonzero(mask)
    if ys.size == 0:
        return (0, 0, 0, 0)
    return (int(xs.min()), int(ys.min()), int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1))


# Precomputed, bbox-cropped scaled templates for the recognizer.
_TEMPLATES: list[tuple[str, np.ndarray, tuple[int, int, int, int]]] | None = None
_EXACT: dict[bytes, tuple[str, tuple[int, int]]] | None = None


def templates() -> list[tuple[str, np.ndarray, tuple[int, int, int, int]]]:
    """[(char, cropped_scaled_bitmap, full-cell bbox)] for template matching."""
    global _TEMPLATES
    if _TEMPLATES is None:
        out = []
        for ch in sorted(GLYPHS):
            sg = scaled_glyph(ch)
            x, y, w, h = ink_bbox(sg)
            out.append((ch, sg[y : y + h, x : x + w].copy(), (x, y, w, h)))
        _TEMPLATES = out
    return _TEMPLATES


def exact_templates() -> dict[bytes, tuple[str, tuple[int, int]]]:
    """{cropped_bitmap_bytes: (char, shape)} — O(1) exact-match fast path for
    cleanly binarized glyphs (the overwhelmingly common case; the Hamming
    nearest-template search remains the fallback)."""
    global _EXACT
    if _EXACT is None:
        _EXACT = {
            tmpl.tobytes(): (ch, tmpl.shape) for ch, tmpl, _ in templates()
        }
    return _EXACT
