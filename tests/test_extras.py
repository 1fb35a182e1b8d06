"""Parity extras: compression ladder, PDF sink, dead-code-parity kernels."""

import numpy as np

from api_ocr_spark.imaging import render
from api_ocr_spark.kernels import compression, enhance, extras
from api_ocr_spark.ocr import engine
from api_ocr_spark.operators import pdf_sink


def test_compress_image_caps_dimension_and_fits_budget():
    img = np.full((1500, 2400), 200, np.uint8)
    decoded, encoded, info = compression.compress_image(img, target_mb=1.0)
    assert max(decoded.shape) == compression.MAX_DIMENSION
    assert info["resized"] and info["fit"]
    assert len(encoded) <= 1024 * 1024


def test_compress_image_lossless_png_method():
    img = render.render_text_image("compress me please", "plain", 0)
    decoded, _, info = compression.compress_image(img, target_mb=10.0, method="png")
    assert np.array_equal(decoded, img)  # PNG ladder is lossless
    assert not info["resized"] and info["method"] == "png"


def test_compress_image_jpeg_ladder_reference_semantics():
    img = render.render_text_image("compress me with the real jpeg ladder", "plain", 0)
    # roomy budget → first rung (quality 95) wins
    decoded, encoded, info = compression.compress_image(img, target_mb=10.0)
    assert info == {"method": "jpeg", "quality": 95, "bytes": len(encoded),
                    "fit": True, "resized": False}
    assert encoded[:2] == b"\xff\xd8" and encoded[-2:] == b"\xff\xd9"
    # impossible budget → best (smallest) rung >= min_quality 75 kept,
    # exactly the reference's fallback (compression.py:71,95-100)
    _, enc2, info2 = compression.compress_image(img, target_mb=1e-5)
    assert info2["fit"] is False and info2["quality"] in (95, 85, 75)
    # the decoded-back pixels still binarize to the SAME ink mask → OCR exact
    from api_ocr_spark.kernels import enhance as enh
    assert np.array_equal(enh.binarize_otsu(decoded) > 0, enh.binarize_otsu(img) > 0)


def test_compress_image_no_fit_seeds_with_original():
    """Reference fallback seed (compression.py:73-76,95-100): best_result
    starts as the ORIGINAL image at the q85 size estimate — when no rung is
    strictly smaller (constant image: all rungs encode identically), the
    UNCOMPRESSED pixels come back."""
    flat = np.full((32, 32), 131, np.uint8)
    decoded, _, info = compression.compress_image(flat, target_mb=1e-9)
    assert info["fit"] is False and info.get("fallback") == "original"
    assert info["quality"] is None
    assert np.array_equal(decoded, flat)  # original pixels, not decoded JPEG


def test_jpeg_codec_roundtrip_properties():
    from api_ocr_spark.imaging import jpeg
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (37, 61)).astype(np.uint8)  # non-multiple-of-8 dims
    prev_psnr = 0.0
    prev_size = 10**9
    for q in (15, 50, 75, 95):
        data = jpeg.encode_gray_jpeg(img, q)
        dec = jpeg.decode_gray_jpeg(data)
        assert dec.shape == img.shape and dec.dtype == np.uint8
        mse = float(((dec.astype(float) - img) ** 2).mean())
        psnr = 10 * np.log10(255**2 / max(mse, 1e-9))
        assert psnr > prev_psnr  # quality is monotone in PSNR
        prev_psnr = psnr
        _ = prev_size
    # constant image survives exactly (DC-only blocks)
    flat = np.full((16, 24), 131, np.uint8)
    assert np.array_equal(jpeg.decode_gray_jpeg(jpeg.encode_gray_jpeg(flat, 75)), flat)


def test_ocr_exact_through_jpeg_roundtrip():
    """Lossy JPEG at ladder qualities preserves the binarized ink mask of
    rendered pages — measured property backing the jpg media-store path."""
    from api_ocr_spark.imaging import jpeg
    from api_ocr_spark.kernels import enhance as enh
    from api_ocr_spark.ocr import engine as eng
    page = render.render_text_image("the quick brown fox 12:30 jumps", "noisy", 7)
    for q in (95, 85):
        dec = jpeg.decode_gray_jpeg(jpeg.encode_gray_jpeg(page, q))
        assert eng.ocr_image(dec) == eng.ocr_image(page), q
        assert np.array_equal(enh.binarize_otsu(dec) > 0, enh.binarize_otsu(page) > 0)


def test_pdf_from_words_valid_and_searchable():
    img = render.render_text_image("hello pdf world", "plain", 0)
    words = engine.get_text_data(img)
    pdf = pdf_sink.pdf_from_words(words, img.shape[1], img.shape[0])
    assert pdf.startswith(b"%PDF-1.4")
    assert pdf.rstrip().endswith(b"%%EOF")
    assert b"(hello) Tj" in pdf and b"(world) Tj" in pdf
    # y-axis inverted: first word's Tm y < page height
    assert b"/F1 " in pdf


def test_pdf_parse_roundtrips_sink_output():
    """Layout parse (sources/pdf_source) inverts the sink exactly: every
    word comes back with its text, reading order, and the sink's own mapped
    page coordinates/font size (2-dp, the stream's printed precision)."""
    from api_ocr_spark.sources import pdf_source

    img = render.render_text_image("uno dos tres cuatro", "plain", 3)
    words = engine.get_text_data(img)
    pdf = pdf_sink.pdf_from_words(words, img.shape[1], img.shape[0])
    got = pdf_source.parse_pdf_words(pdf)
    assert [w["text"] for w in got] == [w["text"] for w in words]
    assert [w["word_idx"] for w in got] == list(range(len(words)))
    # recompute the sink's coordinate map and compare at printed precision
    pw, ph = pdf_sink.A4
    margin = 36.0
    scale = min((pw - 2 * margin) / img.shape[1], (ph - 2 * margin) / img.shape[0])
    ox = (pw - img.shape[1] * scale) / 2
    oy = (ph - img.shape[0] * scale) / 2
    for src, parsed in zip(words, got):
        x, y, _, h = src["bbox"]
        assert abs(parsed["x_pt"] - (ox + x * scale)) < 0.006
        assert abs(parsed["y_pt"] - (ph - (oy + (y + h) * scale))) < 0.006
        assert abs(parsed["font_size"] - max(6.0, min(24.0, h * scale * 0.8))) < 0.006


def test_pdf_parse_escapes_and_rejects():
    from api_ocr_spark.sources import pdf_source

    pdf = pdf_sink.pdf_from_words(
        [{"text": "par(en)s and \\ slash", "bbox": (5, 5, 80, 12)}], 200, 100)
    got = pdf_source.parse_pdf_words(pdf)
    assert got[0]["text"] == "par(en)s and \\ slash"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pdf_source.parse_pdf_words(b"not a pdf at all")
    with _pytest.raises(ValueError):
        pdf_source.parse_pdf_words(
            b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode >>\nendobj")


def test_pdf_words_table_stage(spark):
    """The Spark stage emits one row per word with the parser's output;
    unparseable rows drop to zero rows instead of failing the stage."""
    from api_ocr_spark.sources import pdf_source

    img = render.render_text_image("spark table words", "plain", 5)
    words = engine.get_text_data(img)
    pdf = pdf_sink.pdf_from_words(words, img.shape[1], img.shape[0])
    df = spark.createDataFrame(
        [("d1", "m1", bytearray(pdf)), ("d2", "m2", bytearray(b"junk"))],
        "doc_id string, media_ref string, pdf binary")
    rows = pdf_source.pdf_words_table(df).collect()
    assert {r.doc_id for r in rows} == {"d1"}
    assert [r.text for r in sorted(rows, key=lambda r: r.word_idx)] == \
        [w["text"] for w in words]


def test_resize_for_ocr_upscales_only():
    small = np.zeros((50, 100), np.uint8)
    out = extras.resize_for_ocr(small, target_width=400)
    assert out.shape == (200, 400)
    big = np.zeros((50, 3000), np.uint8)
    assert extras.resize_for_ocr(big).shape == big.shape


def test_apply_clahe_improves_contrast():
    rng = np.random.default_rng(0)
    low = (rng.integers(100, 140, (64, 64))).astype(np.uint8)  # low contrast
    out = extras.apply_clahe(low)
    assert out.std() > low.std()
    assert out.shape == low.shape


def test_detect_document_contour_crops_page():
    page = render.render_text_image("some page text", "plain", 0)
    canvas = np.zeros((page.shape[0] + 40, page.shape[1] + 60), np.uint8)
    canvas[20:20 + page.shape[0], 30:30 + page.shape[1]] = page
    cropped, found = extras.detect_document_contour(canvas)
    assert found and cropped.shape == page.shape
    assert engine.ocr_image(cropped).replace("\n", " ") == "some page text"


def test_four_point_transform_axis_aligned_equals_crop():
    page = render.render_text_image("warp crop parity", "noisy", 5)
    canvas = np.zeros((page.shape[0] + 30, page.shape[1] + 50), np.uint8)
    canvas[12:12 + page.shape[0], 21:21 + page.shape[1]] = page
    quad = [(21, 12), (21 + page.shape[1] - 1, 12),
            (21 + page.shape[1] - 1, 12 + page.shape[0] - 1),
            (21, 12 + page.shape[0] - 1)]
    warped = extras.four_point_transform(canvas, quad)
    assert np.array_equal(warped, page)  # bilinear at integer coords: exact


def test_order_quad():
    got = extras.order_quad([(9, 0), (0, 0), (0, 7), (9, 7)])
    assert np.array_equal(got, [[0, 0], [9, 0], [9, 7], [0, 7]])


def test_warp_perspective_matches_analytic_gradient():
    """Bilinear sampling of a LINEAR image is exact, so warping a gradient
    through a known homography must reproduce the gradient evaluated at the
    inverse-mapped coordinates (interior, away from the border fill)."""
    h, w = 40, 50
    ys, xs = np.mgrid[0:h, 0:w]
    grad = (2.0 * xs + 3.0 * ys).astype(np.float64)
    src = [(5, 4), (44, 6), (42, 35), (3, 33)]  # tilted quad inside the image
    dst = [(0, 0), (29, 0), (29, 19), (0, 19)]
    m = extras.perspective_matrix(src, dst)
    out = extras.warp_perspective(grad, m, 20, 30)
    m_inv = np.linalg.inv(m)
    for (u, v) in [(5, 5), (15, 10), (25, 17), (2, 3)]:
        p = m_inv @ np.array([u, v, 1.0])
        sx, sy = p[0] / p[2], p[1] / p[2]
        assert abs(out[v, u] - (2.0 * sx + 3.0 * sy)) < 1e-6


def test_resize_for_ocr_is_cubic():
    # a linear ramp upscaled with cubic convolution stays a linear ramp
    # (cubic kernels reproduce polynomials up to degree 1 exactly)
    ramp = np.tile(np.arange(0, 200, 2, dtype=np.uint8), (20, 1))
    out = extras.resize_for_ocr(ramp, target_width=200)
    assert out.shape == (40, 200)
    inner = out[10, 20:180].astype(float)
    diffs = np.diff(inner)
    # ×2 upscale samples at t={0.25,0.75} where the a=-0.75 kernel wiggles;
    # with uint8 rounding the steps alternate 2,0 — mean slope is exact,
    # local steps stay small and non-negative (monotone ramp preserved)
    assert abs(diffs.mean() - 1.0) < 0.05
    assert diffs.min() >= 0 and diffs.max() <= 3


def test_try_multiple_preprocessings_argmax():
    img = render.render_text_image("four words right here", "plain", 0)
    out = extras.try_multiple_preprocessings(img)
    assert out["n_words"] == 4
    assert out["variant"] in ("otsu", "adaptive", "sauvola")


def test_detect_text_fields():
    img = np.full((200, 400), 230, np.uint8)
    img[100:103, 50:250] = 30   # a 200px underline
    img[150:152, 10:50] = 30    # too short
    binary = enhance.binarize_otsu(img)
    fields = extras.detect_text_fields(binary)
    assert len(fields) == 1
    x, y, w, h = fields[0]["bbox"]
    assert x == 50 and w == 200


def test_extract_table_cells_grid():
    img = np.full((120, 240), 230, np.uint8)
    img[0:3, :] = 30; img[-3:, :] = 30; img[58:61, :] = 30       # horizontal rules
    img[:, 0:3] = 30; img[:, -3:] = 30; img[:, 118:121] = 30     # vertical rules
    binary = enhance.binarize_otsu(img)
    cells = extras.extract_table_cells(binary, (0, 0, 240, 120))
    assert len(cells) == 4  # 2x2 grid
    assert {(c["row"], c["col"]) for c in cells} == {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_extract_table_cells_no_rules_whole_roi():
    img = np.full((50, 50), 230, np.uint8)
    binary = enhance.binarize_otsu(img)
    cells = extras.extract_table_cells(binary, (0, 0, 50, 50))
    assert len(cells) == 1 and cells[0]["bbox"] == (0, 0, 50, 50)


def test_corregir_ortografia_noop_default():
    assert extras.corregir_ortografia("teh txt") == "teh txt"
    assert extras.corregir_ortografia("teh txt", enabled=True) == "teh txt"  # lib absent
