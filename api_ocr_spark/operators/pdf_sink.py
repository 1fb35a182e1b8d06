"""PDF sink: render OCR word coordinates into a searchable-text PDF.

Engine twin of the reference's ReportLab canvas path
(/root/reference/main.py:599-654 `generar_pdf_desde_coordenadas`):
scale/center image coords onto the page, invert the Y axis, font size
max(6, min(24, h*scale*0.8)), draw each word at its position. ReportLab is
unavailable here, so the writer emits a minimal uncompressed PDF 1.4 by hand
(stdlib only) — Helvetica Tj operators at the mapped coordinates.

Spark-side: `pdf_per_document` is an Arrow-batched mapInPandas stage emitting
one BinaryType PDF per document — an output-table sink, not needed for span
equality (SURVEY.md §2.1).
"""

from __future__ import annotations

from collections.abc import Iterator

A4 = (595.27, 841.89)  # points
LETTER = (612.0, 792.0)


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def pdf_from_words(
    words: list[dict], img_w: int, img_h: int, page: tuple[float, float] = A4
) -> bytes:
    """words: [{text, bbox:(x,y,w,h)}] in image coordinates → PDF bytes."""
    pw, ph = page
    margin = 36.0
    scale = min((pw - 2 * margin) / max(img_w, 1), (ph - 2 * margin) / max(img_h, 1))
    ox = (pw - img_w * scale) / 2
    oy = (ph - img_h * scale) / 2
    ops = ["BT", "/F1 12 Tf"]
    for w in words:
        x, y, _, h = w["bbox"]
        font_size = max(6.0, min(24.0, h * scale * 0.8))  # main.py:648
        px = ox + x * scale
        py = ph - (oy + (y + h) * scale)  # invert Y (main.py:642-645)
        ops.append(f"/F1 {font_size:.2f} Tf")
        ops.append(f"1 0 0 1 {px:.2f} {py:.2f} Tm")
        ops.append(f"({_esc(str(w['text']))}) Tj")
    ops.append("ET")
    stream = "\n".join(ops).encode("latin-1", "replace")

    objs: list[bytes] = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [3 0 R] /Count 1 >>".encode())
    objs.append(
        f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {pw:.2f} {ph:.2f}] "
        f"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>".encode()
    )
    objs.append(
        f"<< /Length {len(stream)} >>\nstream\n".encode() + stream + b"\nendstream"
    )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs)+1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs)+1} /Root 1 0 R >>\nstartxref\n{xref_pos}\n%%EOF"
    ).encode()
    return bytes(out)


def pdf_per_document(media_with_bytes):
    """mapInPandas stage: (doc_id, media_ref, bytes) → (doc_id, media_ref,
    pdf:binary). One OCR-coords pass per image, then the coordinate-mapped
    PDF (the reference's /ocr/pdf endpoint flow, main.py:1355-1465)."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from ..imaging import png as png_codec
        from ..ocr import engine

        for pdf_in in batches:
            out = {"doc_id": [], "media_ref": [], "pdf": []}
            for doc_id, media_ref, data in zip(
                pdf_in["doc_id"], pdf_in["media_ref"], pdf_in["bytes"]
            ):
                gray = png_codec.decode_gray(bytes(data))
                words = engine.get_text_data(gray)
                out["doc_id"].append(doc_id)
                out["media_ref"].append(media_ref)
                out["pdf"].append(pdf_from_words(words, gray.shape[1], gray.shape[0]))
            yield pd.DataFrame(out)

    return media_with_bytes.mapInPandas(gen, schema="doc_id string, media_ref string, pdf binary")
