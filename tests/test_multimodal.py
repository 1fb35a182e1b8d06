"""Multimodal binary-column operators: real image ops, stubbed audio/video
plumbing (schema + batch shape + determinism)."""

import pytest
from pyspark.sql import functions as F

from api_ocr_spark.operators import multimodal
from api_ocr_spark.sources import interleave, tables


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = tables.load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return interleave.build_media(docs).cache()


def test_image_metadata_real_decode(media):
    meta = multimodal.image_metadata(media).collect()
    assert meta
    for r in meta:
        assert r.format in ("png", "jpeg") and r.width > 0 and r.height > 0
        assert 0 < r.ink_ratio < 0.5  # text pages are mostly background
        assert 0 < r.mean_intensity < 255
    assert {r.format for r in meta} == {"png", "jpeg"}  # mixed-format store


def test_image_metadata_corrupt_row(spark):
    df = spark.createDataFrame([("bad", b"not a png")], "media_ref string, bytes binary")
    r = multimodal.image_metadata(df).collect()[0]
    assert r.format == "unknown" and r.width == -1 and r.n_bytes == 9


def test_image_resize_caps_dimension(media):
    out = multimodal.image_resize(media, max_dim=100).collect()
    for r in out:
        assert max(r.width, r.height) <= 100
    # bytes are decodable PNGs
    from api_ocr_spark.imaging import png

    img = png.decode_gray(bytes(out[0].bytes))
    assert img.shape == (out[0].height, out[0].width)


def test_audio_stub_raises_without_fake(media):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc_info:
        multimodal.decode_audio_stub(media, fake=False).count()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, Py4JJavaError)


def test_audio_stub_fake_deterministic(media):
    a = multimodal.decode_audio_stub(media, fake=True).orderBy("media_ref").collect()
    b = multimodal.decode_audio_stub(media, fake=True).orderBy("media_ref").collect()
    assert [(r.media_ref, r.rms) for r in a] == [(r.media_ref, r.rms) for r in b]
    for r in a:
        assert r.sample_rate == 16000 and r.n_samples == 1600
        assert r.duration_s == 0.1 and r.rms > 0


def test_video_stub_fake_frames(media):
    frames = multimodal.sample_video_frames_stub(media, fps=2.0, fake=True).collect()
    assert frames
    from api_ocr_spark.imaging import png

    by_ref = {}
    for r in frames:
        by_ref.setdefault(r.media_ref, []).append(r)
        img = png.decode_gray(bytes(r.frame_png))
        assert img.ndim == 2 and img.size > 0
    for ref, rs in by_ref.items():
        idxs = sorted(r.frame_idx for r in rs)
        assert idxs == list(range(len(idxs)))  # dense frame indices
        assert all(abs(r.ts_s - r.frame_idx / 2.0) < 1e-9 for r in rs)
