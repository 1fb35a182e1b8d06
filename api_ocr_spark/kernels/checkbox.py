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
"""

from __future__ import annotations

import numpy as np

from .detection import connected_components_stats

MIN_AREA = 50
MAX_AREA = 5000
MIN_SIDE = 16  # rejects 10x14 font glyphs and interior mark blocks; the
               # reference relies on real-scan scale for the same separation
MARKED_PROPORTION = 0.1
BORDER_INSET = 4


def _interior(ink: np.ndarray, bbox: tuple[int, int, int, int]) -> np.ndarray:
    x, y, w, h = bbox
    i = BORDER_INSET
    return ink[y + i : y + h - i, x + i : x + w - i]


def is_checkbox_marked(ink: np.ndarray, bbox: tuple[int, int, int, int]) -> tuple[bool, float]:
    roi = _interior(ink, bbox)
    if roi.size == 0:
        return False, 0.0
    prop = float(roi.mean())
    return prop > MARKED_PROPORTION, round(min(prop * 100.0, 100.0), 2)


def detect_checkboxes(binary: np.ndarray) -> list[dict]:
    """Detect square/circle checkboxes on a binarized (ink=255) image.

    Returns reference-shaped dicts {bbox, tipo, marked, confidence}
    (/root/reference/preprocessing/checkbox.py:64-90), reading-ordered (y,x).
    """
    ink = binary > 0
    out = []
    for st in connected_components_stats(ink):
        x, y, w, h = st["bbox"]
        bbox_area = w * h
        if not (MIN_AREA <= bbox_area <= MAX_AREA) or min(w, h) < MIN_SIDE:
            continue
        aspect = w / max(h, 1)
        if not (0.6 < aspect < 1.4):
            continue
        # ring test: border band must be substantially inked, interior not full
        roi = ink[y : y + h, x : x + w]
        border = np.concatenate([roi[0, :], roi[-1, :], roi[:, 0], roi[:, -1]])
        if border.mean() < 0.3:
            continue
        # square vs circle: a square ring occupies its bbox corners; a circle
        # ring leaves them empty (reference uses circularity 4πA/P²>0.4,
        # checkbox.py:82-90 — same decision on axis-aligned renders)
        c = 2
        corners = [roi[:c, :c], roi[:c, -c:], roi[-c:, :c], roi[-c:, -c:]]
        corner_ink = float(np.mean([cr.mean() for cr in corners]))
        tipo = "square" if corner_ink > 0.5 else "circle"
        marked, conf = is_checkbox_marked(ink, (x, y, w, h))
        out.append(
            {"bbox": (x, y, w, h), "tipo": tipo, "marked": marked, "confidence": conf}
        )
    out.sort(key=lambda cb: (cb["bbox"][1], cb["bbox"][0]))
    return out
