"""Parity kernels for reference functions that are exported but dead code in
the reference itself (SURVEY.md §2.8 flags each) — implemented so the
operator inventory is complete, unit-tested, and available to users:

  resize_for_ocr            /root/reference/preprocessing/enhance.py:66-72
  apply_clahe               enhance.py:131-139
  detect_document_contour   enhance.py:165-214
  try_multiple_preprocessings enhance.py:217-236
  detect_text_fields        /root/reference/preprocessing/detection.py:95-138
  extract_table_cells       detection.py:49-58 (stub in the reference too)
  corregir_ortografia       /root/reference/ocr/postprocess.py:114-133
"""

from __future__ import annotations

import numpy as np

from . import detection, enhance


def resize_for_ocr(gray: np.ndarray, target_width: int = 2000) -> np.ndarray:
    """Upscale width to target if smaller (reference uses INTER_CUBIC;
    nearest keeps the binary glyph structure exact)."""
    h, w = gray.shape
    if w >= target_width:
        return gray
    scale = target_width / w
    return enhance.resize_nearest(gray, int(h * scale), target_width)


def apply_clahe(gray: np.ndarray, clip: float = 3.0, tiles: int = 8) -> np.ndarray:
    """Tile-local histogram equalization with clip limit — numpy CLAHE
    (reference: LAB-space cv2.createCLAHE(3.0, 8x8) on the L channel)."""
    h, w = gray.shape
    out = np.empty_like(gray)
    ys = np.linspace(0, h, tiles + 1, dtype=int)
    xs = np.linspace(0, w, tiles + 1, dtype=int)
    for i in range(tiles):
        for j in range(tiles):
            tile = gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
            if tile.size == 0:
                continue
            hist = np.bincount(tile.ravel(), minlength=256).astype(np.float64)
            limit = clip * tile.size / 256.0
            excess = np.maximum(hist - limit, 0).sum()
            hist = np.minimum(hist, limit) + excess / 256.0
            cdf = np.cumsum(hist)
            lut = np.clip(255.0 * cdf / max(cdf[-1], 1), 0, 255).astype(np.uint8)
            out[ys[i]:ys[i + 1], xs[j]:xs[j + 1]] = lut[tile]
    return out


def detect_document_contour(gray: np.ndarray) -> tuple[np.ndarray, bool]:
    """Find the dominant bright quadrilateral (a scanned page on a dark
    background) and crop to it; returns (image, found). The reference warps
    via a 4-point perspective transform; on axis-aligned fixtures the
    bounding-box crop is the same operation."""
    bright = gray > enhance.otsu_threshold(gray)
    stats = detection.connected_components_stats(bright)
    if not stats:
        return gray, False
    big = max(stats, key=lambda s: s["area"])
    x, y, w, h = big["bbox"]
    if w * h < 0.25 * gray.size:  # no dominant page region
        return gray, False
    return gray[y:y + h, x:x + w], True


def try_multiple_preprocessings(gray: np.ndarray) -> dict:
    """Run several preprocessing pipelines and keep the OCR text with the
    max word count (reference: enhance.py:217-236, argmax over variants)."""
    from ..ocr import engine

    variants = {
        "otsu": enhance.binarize(gray, "otsu"),
        "adaptive": enhance.binarize(gray, "adaptive"),
        "sauvola": enhance.binarize(gray, "sauvola"),
    }
    best_name, best_text, best_words = "", "", -1
    for name, binary in variants.items():
        text = engine.ocr_image(binary, preprocess=False)
        n = len(text.split())
        if n > best_words:
            best_name, best_text, best_words = name, text, n
    return {"text": best_text, "variant": best_name, "n_words": best_words}


def detect_text_fields(binary: np.ndarray, min_len: int = 80) -> list[dict]:
    """Form-field detection: long horizontal strokes (underlines) become
    field bboxes with a label region above (reference: HoughLinesP lines
    >80 px, detection.py:95-138)."""
    ink = binary > 0
    lines = detection._long_runs(ink, min_len, axis=1)
    out = []
    for st in detection.connected_components_stats(lines):
        x, y, w, h = st["bbox"]
        if w < min_len or h > 6:
            continue
        out.append({
            "bbox": (x, y - 24, w, 24),          # write-in area above the rule
            "label_bbox": (x, max(0, y - 48), w, 24),
            "type": "field",
        })
    out.sort(key=lambda f: (f["bbox"][1], f["bbox"][0]))
    return out


def extract_table_cells(binary: np.ndarray, table_bbox: tuple[int, int, int, int]) -> list[dict]:
    """Split a ruled table into cells by its internal rules. The reference
    version is a stub returning the whole ROI (detection.py:49-58); this one
    splits on full-span horizontal/vertical rules when present, else returns
    the whole ROI (superset of reference behavior)."""
    x, y, w, h = table_bbox
    roi = (binary[y:y + h, x:x + w] > 0)
    if roi.size == 0:
        return []
    row_rule = detection.max_run_lengths(roi, axis=1) >= 0.85 * w
    col_rule = detection.max_run_lengths(roi, axis=0) >= 0.85 * h
    def bands(rule: np.ndarray) -> list[tuple[int, int]]:
        out, start = [], None
        for i, r in enumerate(rule):
            if not r and start is None:
                start = i
            elif r and start is not None:
                out.append((start, i)); start = None
        if start is not None:
            out.append((start, len(rule)))
        return [(a, b) for a, b in out if b - a >= 4]
    rows = bands(row_rule) or [(0, h)]
    cols = bands(col_rule) or [(0, w)]
    cells = []
    for ri, (r0, r1) in enumerate(rows):
        for ci, (c0, c1) in enumerate(cols):
            cells.append({"row": ri, "col": ci,
                          "bbox": (x + c0, y + r0, c1 - c0, r1 - r0)})
    return cells


def corregir_ortografia(text: str, enabled: bool = False) -> str:
    """Optional word-by-word spellcheck (reference: pyspellchecker if
    installed; it is NOT in requirements.txt, so the production default is a
    no-op — postprocess.py:114-133). Kept as the same guarded no-op."""
    if not enabled:
        return text
    try:
        from spellchecker import SpellChecker  # pragma: no cover
    except ImportError:
        return text
    sc = SpellChecker()  # pragma: no cover
    return " ".join(sc.correction(w) or w for w in text.split())  # pragma: no cover
