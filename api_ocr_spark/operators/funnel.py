"""Corpus-curation funnel with first-failing-stage attribution — the
debugging view every large-scale filtering pipeline needs: not just which
documents survive, but WHICH stage removed each casualty, so a corpus
regression ("we lost 40% of source X") is attributable in one query
(cf. the per-stage accounting tables of C4 / RefinedWeb / Dolma reports).

The reference service (/root/reference — per-request OCR) has no corpus
layer; this composes this engine's own curation operators.

Stage order (first failure wins, mirroring a real pipeline's cheapest-
first layout):
  1. exact_dup   — not the min-doc_id keeper of the md5 fingerprint group
  2. too_short   — token count below the floor
  3. c4_quality  — functions/text.c4_doc_stats keep == false
  4. kept

Shape at 100 TB: ONE fingerprint-keyed shuffle (map-side partial min —
a billion-copy boilerplate page sends one row per map task) plus the
doc-keyed joins back; every quality signal is a zero-shuffle codegen map
(c4_doc_stats, token_count). The funnel costs the dedup shuffle you were
already paying, not a pass per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import c4_doc_stats, fingerprint_md5, token_count


def curation_funnel(documents: DataFrame, min_tokens: int = 12,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document funnel verdict:
    (doc_id, stage, n_tokens, n_sentences), stage in
    {exact_dup, too_short, c4_quality, kept}."""
    base = documents.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    fp = base.select("doc_id", fingerprint_md5(F.col("text")).alias("fp"),
                     token_count(F.col("text")).cast("long")
                     .alias("n_tokens"))
    keepers = fp.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
    stats = c4_doc_stats(base).select("doc_id", "n_sentences", "keep")
    flags = (
        fp.join(keepers, "fp")
        .join(stats, "doc_id")
        .select(
            "doc_id",
            F.when(F.col("doc_id") != F.col("keeper"), "exact_dup")
            .when(F.col("n_tokens") < min_tokens, "too_short")
            .when(~F.col("keep"), "c4_quality")
            .otherwise("kept").alias("stage"),
            "n_tokens", "n_sentences",
        )
    )
    return flags
