"""Input validation + quarantine routing + engine health.

The reference rejects bad uploads with HTTP 400 (`validate_file`,
/root/reference/utils/file_handling.py:13-18; whitelist config.py:15) and
exposes a health endpoint introspecting the OCR engine
(/root/reference/main.py:699-715). In a batch engine, rejection becomes row
routing: invalid rows land in a quarantine output, never exceptions
(SURVEY.md §2.1). The callback sink (integration/infinityfree.py — dead code
in the reference) maps to a foreachBatch hook.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import ALLOWED_EXTENSIONS

_EXT_PATTERN = r"\.(jpe?g|png|tiff|bmp|pdf)$"


def split_valid_media(media: DataFrame, ref_col: str = "media_ref", fmt_col: str = "fmt") -> tuple[DataFrame, DataFrame]:
    """(valid, quarantine): rows whose format/extension is whitelisted vs
    not. Accepts either an extension-bearing ref or an explicit fmt column."""
    cols = media.columns
    if fmt_col in cols:
        ok = F.lower(F.col(fmt_col)).isin(*[e.lstrip(".") for e in ALLOWED_EXTENSIONS])
    else:
        ok = F.lower(F.col(ref_col)).rlike(_EXT_PATTERN)
    valid = media.filter(ok)
    quarantine = media.filter(~ok).withColumn(
        "reject_reason", F.lit("unsupported_format")
    )
    return valid, quarantine


def engine_health(spark) -> dict:
    """Batch twin of GET / (/root/reference/main.py:699-715): introspects the
    recognizer (font/templates) instead of the Tesseract binary/tessdata."""
    from ..imaging.font import CHARSET, GLYPHS, templates

    return {
        "status": "ok",
        "engine": "glyph-template-matcher",
        "charset_size": len(CHARSET),
        "glyphs": len(GLYPHS),
        "templates_loaded": len(templates()) > 0,
        "spark_version": spark.version,
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }


def callback_sink(df: DataFrame, callback, batch_size: int = 1000) -> int:
    """foreachPartition-based result callback — the engine analogue of the
    reference's InfinityFree POST client (integration/infinityfree.py:20-43,
    instantiated but never called — kept for API parity). `callback` receives
    lists of Row dicts; returns number of rows sent (counted inside the same
    single execution via a mapPartitions pass — a separate df.count() would
    run the input plan twice)."""
    def handle(it):
        buf, n = [], 0
        for row in it:
            buf.append(row.asDict(recursive=True))
            n += 1
            if len(buf) >= batch_size:
                callback(buf)
                buf = []
        if buf:
            callback(buf)
        yield n

    return sum(df.rdd.mapPartitions(handle).collect())
