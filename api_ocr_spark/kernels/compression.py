"""Image compression — the engine twin of the reference's ImageCompressor
(/root/reference/preprocessing/compression.py:10-117).

Reference semantics: cap max dimension at 1200 (INTER_AREA), then walk a JPEG
quality ladder 95→15 (floor 75) re-encoding until the payload fits the MB
budget, decoding the winner back so downstream OCR sees the compressed
pixels (lossy — pixel-affecting, compression.py:70-100).

Deviation (documented): no JPEG codec exists in this environment (no
cv2/PIL), so the ladder walks zlib/PNG compression levels 1→9 instead —
same byte-budget contract and the same decode-back step, but lossless, so
OCR pixels are unchanged. The dimension-cap half of the reference's
behavior (which *is* pixel-affecting) is reproduced exactly.
"""

from __future__ import annotations

import numpy as np

from ..imaging import png
from .enhance import cap_max_dimension

MAX_DIMENSION = 1200  # /root/reference/preprocessing/compression.py:16
PNG_LEVEL_LADDER = tuple(range(1, 10))  # stands in for JPEG 95→15 (floor 75)


def compress_image(
    img: np.ndarray, target_mb: float = 1.0, max_dimension: int = MAX_DIMENSION
) -> tuple[np.ndarray, bytes, dict]:
    """Returns (decoded_back_image, encoded_bytes, info). Walks the ladder
    until the encoded payload fits target_mb; keeps the last rung otherwise
    (the reference's floor-quality fallback, compression.py:92-100)."""
    capped = cap_max_dimension(img, max_dimension)
    target_bytes = int(target_mb * 1024 * 1024)
    encoded = b""
    level = PNG_LEVEL_LADDER[0]
    for level in PNG_LEVEL_LADDER:
        encoded = png.encode_gray(capped, compress_level=level)
        if len(encoded) <= target_bytes:
            break
    decoded = png.decode_gray(encoded)
    return decoded, encoded, {
        "level": level,
        "bytes": len(encoded),
        "fit": len(encoded) <= target_bytes,
        "resized": capped.shape != img.shape[:2],
    }
