"""Pure-numpy layout analysis: connected components, horizontal-rule census,
table detection, and region segmentation.

Re-implements the semantics of /root/reference/preprocessing/detection.py
(detect_tables :10-46, segment_regions :61-92) and the Hough horizontal-line
census used for routing (/root/reference/main.py:272-283, 999-1011) without
OpenCV. Binary inputs are {0,255} uint8 with ink=255 (inverted), the same
convention as the reference's THRESH_BINARY_INV.
"""

from __future__ import annotations

import numpy as np


def label_components(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """4-connected component labeling via row-run union-find.

    Stand-in for cv2.findContours + boundingRect: downstream code only uses
    component bounding boxes / areas, which labels provide directly.
    """
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent: list[int] = [0]  # parent[0] unused sentinel

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    next_label = 1
    prev_runs: list[tuple[int, int, int]] = []  # (start, end, label) of prior row
    ink = mask > 0
    for y in range(h):
        row = ink[y]
        if not row.any():
            prev_runs = []
            continue
        d = np.diff(row.astype(np.int8))
        starts = list(np.nonzero(d == 1)[0] + 1)
        ends = list(np.nonzero(d == -1)[0] + 1)
        if row[0]:
            starts.insert(0, 0)
        if row[-1]:
            ends.append(w)
        cur_runs: list[tuple[int, int, int]] = []
        pi = 0
        for s, e in zip(starts, ends):
            lbl = 0
            for (ps, pe, pl) in prev_runs:
                if ps < e and s < pe:  # 4-connectivity overlap
                    if lbl == 0:
                        lbl = pl
                    else:
                        union(lbl, pl)
            if lbl == 0:
                lbl = next_label
                parent.append(lbl)
                next_label += 1
            labels[y, s:e] = lbl
            cur_runs.append((s, e, lbl))
        prev_runs = cur_runs
        _ = pi
    # flatten unions and compact label ids
    if next_label > 1:
        roots = np.array([find(i) for i in range(next_label)], dtype=np.int32)
        uniq, remap = np.unique(roots[1:], return_inverse=True)
        lut = np.zeros(next_label, dtype=np.int32)
        lut[1:] = remap + 1
        labels = lut[labels]
        return labels, len(uniq)
    return labels, 0


def component_stats(labels: np.ndarray, n: int) -> list[dict]:
    """Per-component {bbox:(x,y,w,h), area} from a label image."""
    out = []
    for i in range(1, n + 1):
        ys, xs = np.nonzero(labels == i)
        out.append(
            {
                "bbox": (int(xs.min()), int(ys.min()),
                         int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1)),
                "area": int(ys.size),
            }
        )
    return out


def max_run_lengths(ink: np.ndarray, axis: int) -> np.ndarray:
    """Per row (axis=1) or column (axis=0): longest contiguous ink run."""
    a = ink if axis == 1 else ink.T
    run = np.zeros(a.shape[0], dtype=np.int32)
    best = np.zeros(a.shape[0], dtype=np.int32)
    for j in range(a.shape[1]):
        run = (run + 1) * a[:, j]
        np.maximum(best, run, out=best)
    return best


def rule_rows(binary: np.ndarray, min_frac: float = 0.85) -> np.ndarray:
    """Boolean row mask: rows containing a contiguous ink run spanning
    >= min_frac of the width (full-width horizontal rules; used to drop
    ruling before OCR row segmentation). Contiguity matters: fixed-pitch
    text rows can exceed a mean-fraction test but never cross the margins."""
    ink = binary > 0
    return max_run_lengths(ink, axis=1) >= min_frac * ink.shape[1]


def rule_cols(ink: np.ndarray, min_frac: float = 0.85) -> np.ndarray:
    """Boolean column mask for full-height vertical rules (table borders)."""
    return max_run_lengths(ink, axis=0) >= min_frac * ink.shape[0]


def count_horizontal_lines(binary: np.ndarray, min_frac: float = 0.6) -> int:
    """Distinct horizontal rules (consecutive rule-rows = one rule). Mirrors
    the reference's HoughLinesP census that drives the table route
    (/root/reference/main.py:272-283: lines with |Δy|<5 and length>100)."""
    rows = (binary > 0).mean(axis=1) > min_frac
    if not rows.any():
        return 0
    d = np.diff(rows.astype(np.int8))
    return int((d == 1).sum() + (1 if rows[0] else 0))


def detect_tables(binary: np.ndarray) -> list[dict]:
    """Detect ruled/bordered tables: keep only long horizontal/vertical
    strokes, label them, and filter bboxes by the reference's exact gates
    area>5000 ∧ w>100 ∧ h>100 ∧ w/h<10 with confidence = area/image_area
    (/root/reference/preprocessing/detection.py:30-45)."""
    ink = binary > 0
    h, w = ink.shape
    min_len = 40  # reference morph-open kernels are 40x1 / 1x40 (detection.py:21-27)
    horiz = _long_runs(ink, min_len, axis=1)
    vert = _long_runs(ink, min_len, axis=0)
    grid = (horiz | vert).astype(np.uint8) * 255
    labels, n = label_components(grid)
    out = []
    img_area = float(h * w)
    for st in component_stats(labels, n):
        x, y, bw, bh = st["bbox"]
        bbox_area = bw * bh
        if bbox_area > 5000 and bw > 100 and bh > 100 and bw / max(bh, 1) < 10:
            out.append(
                {"bbox": (x, y, bw, bh), "type": "table",
                 "confidence": round(min(bbox_area / img_area, 1.0), 2)}
            )
    return out


def _long_runs(ink: np.ndarray, min_len: int, axis: int) -> np.ndarray:
    """Keep only ink pixels belonging to runs >= min_len along `axis`
    (separable erosion+dilation — the morph-open trick, numpy-style)."""
    a = ink if axis == 1 else ink.T
    h, w = a.shape
    out = np.zeros_like(a)
    pad = np.zeros((h, 1), dtype=bool)
    x = np.hstack([pad, a, pad]).astype(np.int8)
    d = np.diff(x, axis=1)
    for y in range(h):
        starts = np.nonzero(d[y] == 1)[0]
        ends = np.nonzero(d[y] == -1)[0]
        for s, e in zip(starts, ends):
            if e - s >= min_len:
                out[y, s:e] = True
    return out if axis == 1 else out.T


def dilate_box(mask: np.ndarray, radius: int) -> np.ndarray:
    """Binary dilation with a (2r+1)² box via sliding-window sum."""
    from .enhance import _box_sum

    return _box_sum(mask.astype(np.float64), 2 * radius + 1) > 0


def segment_regions(binary: np.ndarray, min_area: int = 500) -> list[dict]:
    """Region proposals: dilate ink to merge words, label, classify.
    Mirrors /root/reference/preprocessing/detection.py:61-92 —
    dilate 5x5 ×3 ≈ box radius 6; classify aspect>3 ∧ h<50 → 'line',
    text_density>0.2 → 'text', else 'image'; drop area<500."""
    ink = binary > 0
    merged = dilate_box(ink, 6)
    labels, n = label_components(merged.astype(np.uint8) * 255)
    out = []
    for st in component_stats(labels, n):
        x, y, w, h = st["bbox"]
        if w * h < min_area:
            continue
        roi = ink[y : y + h, x : x + w]
        density = float(roi.mean())
        aspect = w / max(h, 1)
        if aspect > 3 and h < 50:
            rtype = "line"
        elif density > 0.2:
            rtype = "text"
        else:
            rtype = "image"
        out.append({"bbox": (x, y, w, h), "type": rtype, "confidence": round(density, 2)})
    # reading order (y, x) — /root/reference/main.py:166
    out.sort(key=lambda r: (r["bbox"][1], r["bbox"][0]))
    return out


def contains(outer: tuple[int, int, int, int], inner: tuple[int, int, int, int]) -> bool:
    """bbox containment predicate for the table/region anti-join
    (/root/reference/main.py:148-164)."""
    ox, oy, ow, oh = outer
    ix, iy, iw, ih = inner
    return ox <= ix and oy <= iy and ix + iw <= ox + ow and iy + ih <= oy + oh
