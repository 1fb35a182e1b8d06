"""Checkbox detection on binarized forms — numpy re-implementation of
/root/reference/preprocessing/checkbox.py:14-154.

Reference semantics preserved:
  - candidate components filtered by 50 <= area <= 5000 (checkbox.py:52-54)
  - square vs circle by aspect ratio ∈ (0.6, 1.4) and ring shape
    (circularity in the reference, corner-occupancy here — same decision
    on rendered fixtures, checkbox.py:56-90)
  - marked iff interior dark-pixel proportion > 0.1, confidence =
    proportion*100 (checkbox.py:127-154). Deviation (documented): the ROI is
    inset past the ring border before measuring, because our rendered borders
    are 2px (the reference's real-scan borders are ~1px and it tolerates the
    border ink inside the 0.1 budget).
  - incisos: elongated (aspect > 1.5) small (area < 500) components whose
    PSM-8-style OCR matches ^\\([a-zA-Z0-9]\\)$ become tipo='inciso'
    label checkboxes — never marked, confidence 100, OCR'd text kept
    (checkbox.py:100-121). Ink-pixel area stands in for the reference's
    contourArea; fixture incisos connect their glyphs with a 1-px baseline
    (see imaging/render.render_form), which the engine's rule-row masking
    strips before glyph matching.
"""

from __future__ import annotations

import re

import numpy as np

from .detection import connected_components_stats

MIN_AREA = 50
MAX_AREA = 5000
MIN_SIDE = 16  # rejects 10x14 font glyphs and interior mark blocks; the
               # reference relies on real-scan scale for the same separation
MARKED_PROPORTION = 0.1
BORDER_INSET = 4

# inciso gate — /root/reference/preprocessing/checkbox.py:100-121: elongated
# (aspect > 1.5) small (contour area < 500) components whose OCR matches a
# single parenthesized alphanumeric, e.g. '(a)'
INCISO_MIN_ASPECT = 1.5
INCISO_MAX_AREA = 500
INCISO_PATTERN = re.compile(r"^\([a-zA-Z0-9]\)$")


def _interior(ink: np.ndarray, bbox: tuple[int, int, int, int]) -> np.ndarray:
    x, y, w, h = bbox
    i = BORDER_INSET
    return ink[y + i : y + h - i, x + i : x + w - i]


def is_checkbox_marked(ink: np.ndarray, bbox: tuple[int, int, int, int]) -> tuple[bool, float]:
    """Interior dark-pixel proportion test — exact reference semantics
    (/root/reference/preprocessing/checkbox.py:127-154): marked iff
    proportion > 0.1, confidence = proportion*100 (raw float, no rounding).
    Deviation (documented in the module docstring): the ROI is inset past
    the 2-px rendered ring border before measuring."""
    roi = _interior(ink, bbox)
    if roi.size == 0:
        return False, 0.0
    prop = float(roi.mean())
    return prop > MARKED_PROPORTION, prop * 100.0


def _ocr_component(binary: np.ndarray, bbox: tuple[int, int, int, int]) -> str:
    """PSM-8-style single-shape OCR of a candidate component
    (/root/reference/preprocessing/checkbox.py:100-113 runs Tesseract psm=8
    on the ROI). The engine's rule_rows masking strips the inciso's
    connector baseline (a full-width rule within the component bbox) before
    glyph matching."""
    from ..ocr import engine

    x, y, w, h = bbox
    roi = binary[y : y + h, x : x + w]
    if roi.size == 0:
        return ""
    words = engine.get_text_data(roi, binary=roi)
    return " ".join(wd["text"] for wd in words).strip()


def detect_checkboxes(binary: np.ndarray) -> list[dict]:
    """Detect square/circle/inciso checkboxes on a binarized (ink=255) image.

    Returns reference-shaped dicts {bbox, tipo, marked, confidence, text}
    (/root/reference/preprocessing/checkbox.py:50-121), reading-ordered
    (y,x). Incisos ('(a)'-style lettered options) are never marked and carry
    their OCR'd text with confidence 100, exactly like the reference."""
    ink = binary > 0
    out = []
    for st in connected_components_stats(ink):
        x, y, w, h = st["bbox"]
        bbox_area = w * h
        aspect = w / max(h, 1)
        if (
            MIN_AREA <= bbox_area <= MAX_AREA
            and min(w, h) >= MIN_SIDE
            and 0.6 < aspect < 1.4
        ):
            # ring test: border band substantially inked, interior not full
            roi = ink[y : y + h, x : x + w]
            border = np.concatenate([roi[0, :], roi[-1, :], roi[:, 0], roi[:, -1]])
            if border.mean() < 0.3:
                continue
            # square vs circle: a square ring occupies its bbox corners; a
            # circle ring leaves them empty (reference uses circularity
            # 4πA/P²>0.4, checkbox.py:82-90 — same decision on renders)
            c = 2
            corners = [roi[:c, :c], roi[:c, -c:], roi[-c:, :c], roi[-c:, -c:]]
            corner_ink = float(np.mean([cr.mean() for cr in corners]))
            tipo = "square" if corner_ink > 0.5 else "circle"
            marked, conf = is_checkbox_marked(ink, (x, y, w, h))
            out.append(
                {"bbox": (x, y, w, h), "tipo": tipo, "marked": marked,
                 "confidence": conf, "text": None}
            )
        elif aspect > INCISO_MIN_ASPECT and st["area"] < INCISO_MAX_AREA:
            # inciso: ink area stands in for the reference's contourArea
            text = _ocr_component(binary, (x, y, w, h))
            if INCISO_PATTERN.match(text):
                out.append(
                    {"bbox": (x, y, w, h), "tipo": "inciso", "marked": False,
                     "confidence": 100.0, "text": text}
                )
    out.sort(key=lambda cb: (cb["bbox"][1], cb["bbox"][0]))
    return out
