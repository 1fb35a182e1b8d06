"""Image compression — the engine twin of the reference's ImageCompressor
(/root/reference/preprocessing/compression.py:10-117).

Reference semantics, now reproduced with a REAL baseline JPEG codec
(imaging/jpeg.py — pure numpy + stdlib, written for this engine since the
container has no cv2/PIL): cap max dimension at 1200, then walk the quality
ladder [95, 85, 75, ...] stopping below min_quality=75, accepting the first
rung that fits the byte budget and otherwise keeping the best (smallest)
rung seen — decoding the winner back so downstream OCR sees the compressed
pixels (lossy, exactly like the reference).

The earlier PNG-level ladder survives as method='png' (lossless; the right
choice when the corpus contract requires pixel-exact OCR downstream).
"""

from __future__ import annotations

import numpy as np

from ..imaging import jpeg, png
from .enhance import cap_max_dimension

MAX_DIMENSION = 1200  # /root/reference/preprocessing/compression.py:16
JPEG_QUALITY_LADDER = (95, 85, 75, 65, 55, 45, 35, 25, 15)  # compression.py:75
MIN_QUALITY = 75  # compression.py:71 — ladder stops below this
PNG_LEVEL_LADDER = tuple(range(1, 10))


def compress_image(
    img: np.ndarray,
    target_mb: float = 1.0,
    max_dimension: int = MAX_DIMENSION,
    method: str = "jpeg",
) -> tuple[np.ndarray, bytes, dict]:
    """Returns (decoded_back_image, encoded_bytes, info).

    method='jpeg' (default — reference-exact ladder semantics): first
    quality >= MIN_QUALITY whose payload fits target_mb wins; if none fits,
    the best-result fallback seeds with the ORIGINAL (capped) pixels at the
    quality-85 size estimate exactly like the reference
    (compression.py:73-100 seeds best_result=image /
    best_size=_estimate_size(image)): a rung replaces the seed only when
    strictly smaller than that estimate, otherwise the UNCOMPRESSED pixels
    come back (info['fallback']='original'; the bytes field then carries the
    q85 estimate encoding, since the reference returns pixels only).
    method='png' walks zlib levels 1→9 (lossless)."""
    capped = cap_max_dimension(img, max_dimension)
    target_bytes = int(target_mb * 1024 * 1024)
    if method == "png":
        encoded = b""
        level = PNG_LEVEL_LADDER[0]
        for level in PNG_LEVEL_LADDER:
            encoded = png.encode_gray(capped, compress_level=level)
            if len(encoded) <= target_bytes:
                break
        return png.decode_gray(encoded), encoded, {
            "method": "png", "level": level, "bytes": len(encoded),
            "fit": len(encoded) <= target_bytes,
            "resized": capped.shape != img.shape[:2],
        }
    # reference seed: best_result = original image at the q85 size estimate
    # (_estimate_size, compression.py:102-107) — if no rung beats it, the
    # uncompressed pixels win
    estimate = jpeg.encode_gray_jpeg(capped, quality=85)
    best, best_q, best_size = estimate, None, len(estimate)
    for q in JPEG_QUALITY_LADDER:
        if q < MIN_QUALITY:
            break
        encoded = jpeg.encode_gray_jpeg(capped, quality=q)
        if len(encoded) <= target_bytes:
            return jpeg.decode_gray_jpeg(encoded), encoded, {
                "method": "jpeg", "quality": q, "bytes": len(encoded),
                "fit": True, "resized": capped.shape != img.shape[:2],
            }
        if len(encoded) < best_size:
            best, best_q, best_size = encoded, q, len(encoded)
    if best_q is None:
        return capped, estimate, {
            "method": "jpeg", "quality": None, "bytes": len(estimate),
            "fit": False, "fallback": "original",
            "resized": capped.shape != img.shape[:2],
        }
    return jpeg.decode_gray_jpeg(best), best, {
        "method": "jpeg", "quality": best_q, "bytes": len(best),
        "fit": False, "resized": capped.shape != img.shape[:2],
    }
