"""Deterministic text→raster renderer for fixtures and bench corpora.

Mirrors SURVEY.md §5.2 / FIXTURES.md §2: media images are rendered from known
ground-truth text so expected OCR output is known a priori. Scenario tags map
to the reference's routing classes (/root/reference/main.py:291,1041) and
exercise specific preprocessing kernels:

  plain   clean render                         → binarize only
  skewed  integer per-row shear (±1..7°)       → correct_skew
  noisy   seeded sub-threshold gray noise      → remove_noise / binarize margin
  shadow  horizontal illumination gradient     → remove_shadows / adaptive threshold
  ruled   >10 full-width horizontal rules      → table route (Hough census)
  boxed   text enclosed in a rectangle border  → detect_tables largest-table crop
  checkbox squares/circles + labels            → checkbox pipeline

All randomness is derived from a caller-supplied integer seed — no global
state, fully reproducible across processes/executors.
"""

from __future__ import annotations

import numpy as np

from .font import CELL_W, GLYPH_H, LINE_H, SCALE, CHARSET, scaled_glyph

GLYPH_H_PX = GLYPH_H * SCALE

INK = 30
BG = 230
MARGIN = 8
MAX_LINE_CHARS = 32
SCENARIOS = ("plain", "skewed", "noisy", "shadow", "ruled", "boxed", "skewed_noisy")

# Skew uses the same discrete shear model in render and deskew search so the
# inverse is exact: shift(y) = round(tan(deg) * (y - h/2)).
SKEW_DEGREES = (-7, -5, -3, -2, 2, 3, 5, 7)
NOISE_AMPLITUDE = 60  # |ink-bg| = 200 → global threshold keeps >40px margin
# Shadow depth bounds the background spread so Otsu's between-class variance
# for the ink/bg split dominates any split inside the illumination ramp even
# for sparse-ink renders (~1.5% ink: 0.015·185² ≈ 505 > ramp 0.25·depth²).
SHADOW_DEPTH = 60
RULE_THICKNESS = 3
MIN_RULES = 12  # > reference's >10 horizontal-line table-route threshold


def wrap_text(text: str, width: int = MAX_LINE_CHARS) -> list[str]:
    """Greedy word wrap; words longer than `width` are hard-split."""
    lines: list[str] = []
    cur = ""
    for word in text.split():
        while len(word) > width:
            if cur:
                lines.append(cur)
                cur = ""
            lines.append(word[:width])
            word = word[width:]
        if not cur:
            cur = word
        elif len(cur) + 1 + len(word) <= width:
            cur += " " + word
        else:
            lines.append(cur)
            cur = word
    if cur:
        lines.append(cur)
    return lines or [""]


def render_lines(lines: list[str]) -> np.ndarray:
    """Render wrapped lines on a fixed-pitch grid. Gray uint8, ink on bg."""
    ncols = max((len(l) for l in lines), default=1)
    h = 2 * MARGIN + len(lines) * LINE_H
    w = 2 * MARGIN + max(1, ncols) * CELL_W
    img = np.full((h, w), BG, dtype=np.uint8)
    for li, line in enumerate(lines):
        y0 = MARGIN + li * LINE_H
        for ci, ch in enumerate(line):
            if ch == " " or ch not in CHARSET:
                continue
            g = scaled_glyph(ch)
            x0 = MARGIN + ci * CELL_W
            img[y0 : y0 + g.shape[0], x0 : x0 + g.shape[1]][g] = INK
    return img


def _apply_skew(img: np.ndarray, deg: float) -> np.ndarray:
    h, w = img.shape
    t = np.tan(np.deg2rad(deg))
    shifts = np.round(t * (np.arange(h) - h / 2)).astype(int)
    pad = int(np.abs(shifts).max())
    out = np.full((h, w + 2 * pad), BG, dtype=np.uint8)
    for y in range(h):
        s = shifts[y]
        out[y, pad + s : pad + s + w] = img[y]
    return out


NOISE_DENSITY = 0.15  # fraction of pixels perturbed (speckle model)


def _apply_noise(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Sub-threshold speckle: NOISE_DENSITY of pixels shift by up to
    ±NOISE_AMPLITUDE gray levels (classic scan speckle — and, unlike dense
    uniform noise, it stays PNG-compressible, which matters when millions of
    these flow through shuffles)."""
    mask = rng.random(img.shape) < NOISE_DENSITY
    noise = rng.integers(-NOISE_AMPLITUDE, NOISE_AMPLITUDE + 1, size=img.shape)
    out = img.astype(np.int32)
    out[mask] += noise[mask]
    return np.clip(out, 0, 255).astype(np.uint8)


def _apply_shadow(img: np.ndarray) -> np.ndarray:
    h, w = img.shape
    grad = np.round(np.linspace(0, SHADOW_DEPTH, w)).astype(np.int32)
    return np.clip(img.astype(np.int32) - grad[None, :], 0, 255).astype(np.uint8)


def _apply_rules(img: np.ndarray) -> np.ndarray:
    """Full-width horizontal rules in the inter-line gaps (+ extras below).
    Padding rules are packed at a tight pitch (rule + 5px gap) — they only
    need to count as distinct rules for the table-route census, and a tight
    pack keeps ruled pages from ballooning to several times the text height."""
    h, w = img.shape
    ys = list(range(MARGIN + LINE_H - RULE_THICKNESS - 1, h - RULE_THICKNESS, LINE_H))
    extra_needed = max(0, MIN_RULES - len(ys))
    if extra_needed:
        pitch = RULE_THICKNESS + 5
        pad = np.full((extra_needed * pitch + 8, w), BG, dtype=np.uint8)
        img = np.vstack([img, pad])
        base = h + 4
        ys += [base + i * pitch for i in range(extra_needed)]
        h = img.shape[0]
    img = img.copy()
    for y in ys:
        img[y : y + RULE_THICKNESS, :] = INK
    return img


def _apply_box(img: np.ndarray) -> np.ndarray:
    """Enclose the whole render in a rectangle border (a 1-cell 'table')."""
    h, w = img.shape
    t = RULE_THICKNESS
    # inner padding 16 > the region-segmenter's dilation reach (12) so the
    # border never merges with the first/last text lines
    pad = t + 16
    out = np.full((h + 2 * pad, w + 2 * pad), BG, dtype=np.uint8)
    out[pad : pad + h, pad : pad + w] = img
    out[:t, :] = INK
    out[-t:, :] = INK
    out[:, :t] = INK
    out[:, -t:] = INK
    return out


def render_text_image(text: str, scenario: str = "plain", seed: int = 0) -> np.ndarray:
    """Render `text` (chars outside the font charset are dropped) under a
    scenario transform. Deterministic in (text, scenario, seed)."""
    rng = np.random.default_rng(seed)
    img = render_lines(wrap_text(text.lower()))
    if scenario == "plain":
        return img
    if scenario == "skewed":
        deg = SKEW_DEGREES[int(rng.integers(0, len(SKEW_DEGREES)))]
        return _apply_skew(img, deg)
    if scenario == "noisy":
        return _apply_noise(img, rng)
    if scenario == "shadow":
        return _apply_shadow(img)
    if scenario == "ruled":
        return _apply_rules(img)
    if scenario == "boxed":
        return _apply_box(img)
    if scenario == "skewed_noisy":
        # composite distortion: shear then sub-threshold noise — exercises
        # the skew-candidate retry ladder under a degraded profile
        deg = SKEW_DEGREES[int(rng.integers(0, len(SKEW_DEGREES)))]
        return _apply_noise(_apply_skew(img, deg), rng)
    raise ValueError(f"unknown scenario {scenario!r}")


# ---------------------------------------------------------------- checkboxes

CHECKBOX_SIZE = 18  # px, square side / circle diameter


def render_checkbox_form(
    questions: list[tuple[str, bool, str]], seed: int = 0, row_pitch: int = 48
) -> tuple[np.ndarray, list[dict]]:
    """Render a form of (label, marked, kind) rows; kind ∈ {square, circle}.
    The label sits to the right of its checkbox on the same row (keeps the
    line center inside the reference's 100 px association radius,
    /root/reference/ocr/association.py:30-32; labels should be <= 8 chars).
    `row_pitch` < 30 puts rows in one proximity group (radio-group fixtures,
    association.py:66-99); >= 30 keeps one group per row.

    Returns (image, layout) where layout carries ground-truth checkbox bboxes
    and marked states for association fixtures (FIXTURES.md §5).
    """
    width_chars = max(len(q[0]) for q in questions) if questions else 1
    w = 2 * MARGIN + CHECKBOX_SIZE + 20 + width_chars * CELL_W + CELL_W
    h = 2 * MARGIN + len(questions) * row_pitch
    img = np.full((h, w), BG, dtype=np.uint8)
    layout = []
    for i, (label, marked, kind) in enumerate(questions):
        cy = MARGIN + i * row_pitch
        cx = MARGIN
        s = CHECKBOX_SIZE
        y_label = cy + (s - GLYPH_H_PX) // 2
        x_label = cx + s + 20  # >= WORD_GAP_PX so the ring never merges into the label word
        for ci, ch in enumerate(label.lower()):
            if ch == " " or ch not in CHARSET:
                continue
            g = scaled_glyph(ch)
            x0 = x_label + ci * CELL_W
            img[y_label : y_label + g.shape[0], x0 : x0 + g.shape[1]][g] = INK
        if kind == "square":
            img[cy : cy + 2, cx : cx + s] = INK
            img[cy + s - 2 : cy + s, cx : cx + s] = INK
            img[cy : cy + s, cx : cx + 2] = INK
            img[cy : cy + s, cx + s - 2 : cx + s] = INK
        else:  # circle
            yy, xx = np.mgrid[0:s, 0:s]
            r = (s - 2) / 2
            d = np.sqrt((yy - s / 2 + 0.5) ** 2 + (xx - s / 2 + 0.5) ** 2)
            ring = (d <= r) & (d >= r - 2)
            img[cy : cy + s, cx : cx + s][ring] = INK
        if marked:
            m0 = 5
            img[cy + m0 : cy + s - m0, cx + m0 : cx + s - m0] = INK
        # ground truth records the tight ink bbox (circle rings inscribe the
        # cell, so their ink bbox is (s-2)x(s-2) at +1,+1)
        ink_bbox = (cx, cy, s, s) if kind == "square" else (cx + 1, cy + 1, s - 2, s - 2)
        layout.append(
            {"bbox": ink_bbox, "kind": kind, "marked": marked, "label": label,
             "label_bbox": (x_label, y_label, len(label) * CELL_W, GLYPH_H_PX)}
        )
    return img, layout
