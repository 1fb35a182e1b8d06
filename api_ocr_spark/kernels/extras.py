"""Parity kernels for reference functions that are exported but dead code in
the reference itself (SURVEY.md §2.8 flags each) — implemented so the
operator inventory is complete, unit-tested, and available to users:

  resize_for_ocr            /root/reference/preprocessing/enhance.py:66-72
  apply_clahe               enhance.py:131-139
  detect_document_contour   enhance.py:165-214 (order_quad /
                            perspective_matrix / warp_perspective /
                            four_point_transform are the real 4-point
                            rectification, numpy equivalents of
                            cv2.getPerspectiveTransform + warpPerspective)
  try_multiple_preprocessings enhance.py:217-236
  detect_text_fields        /root/reference/preprocessing/detection.py:95-138
  extract_table_cells       detection.py:49-58 (stub in the reference too)
  corregir_ortografia       /root/reference/ocr/postprocess.py:114-133
"""

from __future__ import annotations

import numpy as np

from . import detection, enhance


def resize_for_ocr(gray: np.ndarray, target_width: int = 2000) -> np.ndarray:
    """Upscale width to target if smaller — reference parity: INTER_CUBIC
    (enhance.resize_cubic, Keys a=-0.75 like cv2), not nearest."""
    h, w = gray.shape
    if w >= target_width:
        return gray
    scale = target_width / w
    return enhance.resize_cubic(gray, int(h * scale), target_width)


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


def order_quad(pts: np.ndarray) -> np.ndarray:
    """Order 4 (x, y) points as [tl, tr, br, bl] — the reference's
    order_points rule (/root/reference/preprocessing/enhance.py:176-188):
    tl = min coordinate sum, br = max sum, tr = min (y−x), bl = max (y−x)."""
    pts = np.asarray(pts, np.float64)
    s = pts.sum(axis=1)
    d = pts[:, 1] - pts[:, 0]
    return np.array([pts[np.argmin(s)], pts[np.argmin(d)],
                     pts[np.argmax(s)], pts[np.argmax(d)]])


def perspective_matrix(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3×3 homography mapping src[i] → dst[i] for 4 point pairs —
    cv2.getPerspectiveTransform equivalent: solve the 8-unknown linear
    system (h22 pinned to 1)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    rows, rhs = [], []
    for (x, y), (u, v) in zip(src, dst):
        rows.append([x, y, 1, 0, 0, 0, -u * x, -u * y])
        rhs.append(u)
        rows.append([0, 0, 0, x, y, 1, -v * x, -v * y])
        rhs.append(v)
    h = np.linalg.solve(np.array(rows), np.array(rhs))
    return np.append(h, 1.0).reshape(3, 3)


def warp_perspective(img: np.ndarray, m: np.ndarray, out_h: int, out_w: int,
                     border: float = 0.0) -> np.ndarray:
    """cv2.warpPerspective equivalent: inverse-map each destination pixel
    through m⁻¹ and bilinear-sample, constant border. Fully vectorized (one
    3×N matmul + four gathers); bilinear at integer source coordinates is
    exact, so an axis-aligned translation warp reproduces a crop
    bit-for-bit (asserted in tests)."""
    m_inv = np.linalg.inv(np.asarray(m, np.float64))
    ys, xs = np.mgrid[0:out_h, 0:out_w]
    pts = np.stack([xs.ravel(), ys.ravel(), np.ones(out_h * out_w)])
    s = m_inv @ pts
    sx, sy = s[0] / s[2], s[1] / s[2]
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx, fy = sx - x0, sy - y0
    h, w = img.shape[:2]
    imgf = np.asarray(img, np.float64)

    def sample(yy, xx):
        valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        return np.where(
            valid, imgf[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)], border)

    v = (sample(y0, x0) * (1 - fx) * (1 - fy)
         + sample(y0, x0 + 1) * fx * (1 - fy)
         + sample(y0 + 1, x0) * (1 - fx) * fy
         + sample(y0 + 1, x0 + 1) * fx * fy)
    out = v.reshape(out_h, out_w)
    if np.issubdtype(np.asarray(img).dtype, np.integer):
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out


def four_point_transform(img: np.ndarray, quad) -> np.ndarray:
    """The reference's 4-point document rectification
    (/root/reference/preprocessing/enhance.py:190-214): order the corners,
    size the output from the longer opposing edge pair, and warp the quad
    onto that rectangle. One deviation, documented: output dims are
    round(edge)+1 (inclusive-corner convention) where the classic formula
    truncates — this keeps an axis-aligned quad's warp IDENTICAL to the
    plain crop instead of dropping the last row/column."""
    rect = order_quad(quad)
    (tl, tr, br, bl) = rect
    width = max(np.hypot(*(br - bl)), np.hypot(*(tr - tl)))
    height = max(np.hypot(*(tr - br)), np.hypot(*(tl - bl)))
    out_w = int(round(width)) + 1
    out_h = int(round(height)) + 1
    dst = np.array([[0, 0], [out_w - 1, 0], [out_w - 1, out_h - 1], [0, out_h - 1]],
                   np.float64)
    m = perspective_matrix(rect, dst)
    return warp_perspective(img, m, out_h, out_w)


def detect_document_contour(gray: np.ndarray) -> tuple[np.ndarray, bool]:
    """Find the dominant bright region (a scanned page on a dark background)
    and rectify it with the reference's 4-point perspective transform
    (enhance.py:165-214); returns (image, found). The quad is the region's
    bbox corners (the connected-component labeling doesn't expose corner
    geometry); for an axis-aligned page the warp is exactly the crop, and
    four_point_transform handles tilted quads when the caller supplies
    them."""
    bright = gray > enhance.otsu_threshold(gray)
    stats = detection.connected_components_stats(bright)
    if not stats:
        return gray, False
    big = max(stats, key=lambda s: s["area"])
    x, y, w, h = big["bbox"]
    if w * h < 0.25 * gray.size:  # no dominant page region
        return gray, False
    quad = [(x, y), (x + w - 1, y), (x + w - 1, y + h - 1), (x, y + h - 1)]
    return four_point_transform(gray, quad), True


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
