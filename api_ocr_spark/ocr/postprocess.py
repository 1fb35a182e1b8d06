"""Text cleanup + regex structuring — exact re-implementation of
/root/reference/ocr/postprocess.py semantics (pure Python; the Spark-native
column-expression versions live in api_ocr_spark.functions.text and are the
hot path — these exist for fixture building and in-UDF use).

Determinism deviation (SURVEY.md §5.2): the reference dedups regex hits with
`list(set(...))` (postprocess.py:56, 80), which is order-unstable; we pin
sorted-unique everywhere.
"""

from __future__ import annotations

import re

WEEKDAYS = ("lunes", "martes", "miercoles", "miércoles", "jueves",
            "viernes", "sabado", "sábado", "domingo")

TIME_RE = r"\b\d{1,2}:\d{2}(?:\s*(?:am|pm|a\.m\.|p\.m\.))?\b"
TIME_RANGE_RE = TIME_RE + r"\s*[-–]\s*" + TIME_RE
DATE_RE = r"\b\d{1,2}\s+de\s+[a-zA-Záéíóúñ]+\s+de\s+\d{4}\b"


def clean_text(text: str) -> str:
    """Collapse blank lines and runs of spaces; strip
    (/root/reference/ocr/postprocess.py:17-21)."""
    text = re.sub(r"\n\s*\n", "\n", text)
    text = re.sub(r"[ \t]+", " ", text)
    return text.strip()


def limpiar_texto_ocr(text: str) -> str:
    """OCR artifact cleanup (/root/reference/ocr/postprocess.py:24-38):
    pipe→space; digit+%/* before a letter → degree form; decimal comma→dot;
    whitespace normalize."""
    text = text.replace("|", " ")
    text = re.sub(r"(\d+)[%*]\s*([A-Za-z])", r"\1° \2", text)
    text = re.sub(r"(\d+)[%*]", r"\1°", text)
    text = re.sub(r"(\d+),(\d+)", r"\1.\2", text)
    text = re.sub(r"\s+", " ", text)
    return text.strip()


def extraer_horarios(text: str) -> list[str]:
    """Times + time ranges, sorted-unique
    (/root/reference/ocr/postprocess.py:41-56)."""
    horas = re.findall(TIME_RE, text, re.IGNORECASE)
    rangos = re.findall(TIME_RANGE_RE, text, re.IGNORECASE)
    return sorted(set(horas + rangos))


def extraer_dias(text: str) -> list[str]:
    """Weekday mentions + '<weekday> <1-2 digits>' forms, sorted-unique
    (/root/reference/ocr/postprocess.py:59-80)."""
    low = text.lower()
    found = [d for d in WEEKDAYS if d in low]
    found += re.findall(r"\b(?:" + "|".join(WEEKDAYS) + r")\s+\d{1,2}\b", low)
    return sorted(set(found))


def extraer_fechas(text: str) -> list[str]:
    """Spanish long dates (/root/reference/ocr/postprocess.py:83-88)."""
    return sorted(set(re.findall(DATE_RE, text, re.IGNORECASE)))


def extraer_materiales(text: str) -> list[str]:
    """Material list after 'deben traer' — reference regex verbatim
    (/root/reference/ocr/postprocess.py:91-99): capture up to the first
    period or newline, split on comma/newline, trim, drop empties. Faithful
    quirks kept: a colon right after 'traer' stays in the first item, and a
    newline ends the capture."""
    m = re.search(r"deben traer\s*([^\.\n]+)", text, re.IGNORECASE)
    if not m:
        return []
    items = re.split(r"[,\n]", m.group(1))
    return [it.strip() for it in items if it.strip()]


def extraer_notas(text: str) -> str:
    """Lines mentioning 'asisten el día' or 'nota', space-joined
    (/root/reference/ocr/postprocess.py:102-111)."""
    out = [ln.strip() for ln in text.split("\n")
           if "asisten el día" in ln.lower() or "nota" in ln.lower()]
    return " ".join(out)


def estructurar_texto_ocr(text: str) -> dict:
    """Structured extraction (/root/reference/ocr/postprocess.py:136-153)."""
    limpio = limpiar_texto_ocr(text)
    return {
        "texto_limpio": limpio,
        "horarios": extraer_horarios(limpio),
        "dias": extraer_dias(limpio),
        "materiales": extraer_materiales(limpio),
        "notas": extraer_notas(text),
        "fechas": extraer_fechas(limpio),
    }
