"""Multimodal binary-column operators for training-data pipelines.

Media are opaque `binary` columns + typed metadata structs; all per-item work
runs in Arrow-batched mapInPandas stages (never per-row Python UDFs).

What is REAL here: PNG decode/metadata/resize/feature-extract (the engine's
own codec + kernels). What is STUBBED (this container has no audio/video/JPEG
libraries): `decode_audio_stub` and `sample_video_frames_stub` raise
NotImplementedError inside a real, schema-correct mapInPandas stage unless
`fake=True`, in which case they emit deterministic fake payloads so the
Spark-side plumbing (schema, partitioning, batch shape) is testable — the
swap-in point for torchaudio/pyav is one function body.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = (
    "media_ref string, width int, height int, n_bytes long, format string, "
    "ink_ratio double, mean_intensity double"
)


def image_metadata(media: DataFrame) -> DataFrame:
    """(media_ref, bytes) → typed metadata + cheap content features
    (decode is real: the engine PNG codec)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..imaging import png as png_codec
        from ..kernels import enhance

        for pdf in batches:
            out = {k: [] for k in ("media_ref", "width", "height", "n_bytes",
                                   "format", "ink_ratio", "mean_intensity")}
            for ref, data in zip(pdf["media_ref"], pdf["bytes"]):
                raw = bytes(data)
                out["media_ref"].append(ref)
                out["n_bytes"].append(len(raw))
                try:
                    img = png_codec.decode_gray_auto(raw)
                    binary = enhance.binarize_otsu(img)
                    out["width"].append(int(img.shape[1]))
                    out["height"].append(int(img.shape[0]))
                    out["format"].append("jpeg" if raw[:2] == b"\xff\xd8" else "png")
                    out["ink_ratio"].append(round(float((binary > 0).mean()), 6))
                    out["mean_intensity"].append(round(float(img.mean()), 4))
                except Exception:  # noqa: BLE001 — quarantine-style row
                    out["width"].append(-1)
                    out["height"].append(-1)
                    out["format"].append("unknown")
                    out["ink_ratio"].append(0.0)
                    out["mean_intensity"].append(0.0)
            yield pd.DataFrame(out)

    return media.select("media_ref", "bytes").mapInPandas(gen, schema=IMAGE_META_SCHEMA)


def image_resize(media: DataFrame, max_dim: int) -> DataFrame:
    """(media_ref, bytes) → re-encoded PNG capped at max_dim (real)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..imaging import png as png_codec
        from ..kernels import enhance

        for pdf in batches:
            out = {"media_ref": [], "bytes": [], "width": [], "height": []}
            for ref, data in zip(pdf["media_ref"], pdf["bytes"]):
                img = enhance.cap_max_dimension(png_codec.decode_gray_auto(bytes(data)), max_dim)
                out["media_ref"].append(ref)
                out["bytes"].append(png_codec.encode_gray(img))
                out["width"].append(int(img.shape[1]))
                out["height"].append(int(img.shape[0]))
            yield pd.DataFrame(out)

    return media.select("media_ref", "bytes").mapInPandas(
        gen, schema="media_ref string, bytes binary, width int, height int")


AUDIO_FEATURES_SCHEMA = (
    "media_ref string, sample_rate int, n_samples long, duration_s double, "
    "rms double, zero_crossings long"
)


def decode_audio_stub(media: DataFrame, fake: bool = False) -> DataFrame:
    """STUB: audio decode + feature extraction. No audio codec exists in this
    container; the mapInPandas stage, schema, and batch shape are real.
    `fake=True` emits a deterministic synthetic waveform derived from the
    payload bytes (tests the plumbing); fake=False raises on first batch,
    marking the torchaudio/soundfile swap-in point."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio decode requires an audio codec (torchaudio/soundfile) "
                    "not present in this environment — plumbing is real, swap "
                    "this function body in production")
            out = {k: [] for k in ("media_ref", "sample_rate", "n_samples",
                                   "duration_s", "rms", "zero_crossings")}
            for ref, data in zip(pdf["media_ref"], pdf["bytes"]):
                seed = int.from_bytes(bytes(data)[:8].ljust(8, b"\0"), "little") % (2**32)
                rng = np.random.default_rng(seed)
                wave = rng.normal(size=1600).astype(np.float32)
                out["media_ref"].append(ref)
                out["sample_rate"].append(16000)
                out["n_samples"].append(wave.size)
                out["duration_s"].append(round(wave.size / 16000.0, 6))
                out["rms"].append(round(float(np.sqrt((wave ** 2).mean())), 6))
                out["zero_crossings"].append(int((np.diff(np.sign(wave)) != 0).sum()))
            yield pd.DataFrame(out)

    return media.select("media_ref", "bytes").mapInPandas(gen, schema=AUDIO_FEATURES_SCHEMA)


VIDEO_FRAMES_SCHEMA = "media_ref string, frame_idx int, ts_s double, frame_png binary"


def sample_video_frames_stub(media: DataFrame, fps: float = 1.0, fake: bool = False) -> DataFrame:
    """STUB: video frame sampling (1 row per sampled frame — a flatMap-shaped
    mapInPandas). fake=True renders deterministic frames via the engine
    renderer; fake=False raises, marking the pyav/ffmpeg swap-in point."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decode requires pyav/ffmpeg not present in this "
                    "environment — plumbing is real, swap this function body")
            from ..imaging import png as png_codec
            from ..imaging.render import render_text_image

            out = {"media_ref": [], "frame_idx": [], "ts_s": [], "frame_png": []}
            import zlib

            for ref, data in zip(pdf["media_ref"], pdf["bytes"]):
                n_frames = 1 + (len(bytes(data)) % 3)
                for i in range(n_frames):
                    # crc32, not builtin hash(): str hashing is randomized
                    # per process (PYTHONHASHSEED) and would make fake
                    # frames differ across executors/runs
                    seed = zlib.crc32(str(ref).encode()) + i
                    img = render_text_image(f"frame {i} of {ref}"[:24], "plain",
                                            seed=seed)
                    out["media_ref"].append(ref)
                    out["frame_idx"].append(i)
                    out["ts_s"].append(round(i / fps, 3))
                    out["frame_png"].append(png_codec.encode_gray(img))
            yield pd.DataFrame(out)

    return media.select("media_ref", "bytes").mapInPandas(gen, schema=VIDEO_FRAMES_SCHEMA)
