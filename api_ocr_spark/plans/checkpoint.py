"""Checkpoint / resume / lineage / metrics (SURVEY.md §4.3.2).

Replaces the reference's in-memory async task store
(/root/reference/background.py:10-45) with durable tables:

  output/    extracted documents (doc_id, spans, extracted_text), appended
             per completed bucket
  lineage/   one row per (run_id, bucket): doc/span counts, wall ms, status
  metrics/   per OCR-partition rows: span counts, conf stats, wall ms —
             the distributed twin of the reference's SQLite ocr_requests
             table (/root/reference/metrics.py:17-66)

Resume semantics: work is split into `n_buckets` by pmod(xxhash64(doc_id), B).
Completed buckets are recorded in lineage; a restarted run anti-joins its
input against completed buckets and processes only the remainder. Output
appends are idempotent because a bucket commits atomically (Spark's
file-commit protocol) and is never reprocessed after its lineage row lands.

On a production lakehouse these are Iceberg tables (MERGE / snapshot
isolation); the sandbox has no Iceberg runtime, so the same protocol runs on
parquet directories — the access pattern and the anti-join resume are
identical (SURVEY.md §1.2).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _bucket_of(col, n_buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def completed_buckets(spark: SparkSession, base_dir: str, run_group: str) -> set[int]:
    path = os.path.join(base_dir, "lineage")
    try:
        lin = spark.read.parquet(path)
    except Exception:  # noqa: BLE001 — first run: no lineage yet
        return set()
    rows = (
        lin.filter((F.col("run_group") == run_group) & (F.col("status") == "done"))
        .select("bucket").distinct().collect()
    )
    return {r.bucket for r in rows}


def run_with_checkpoint(
    spark: SparkSession,
    documents: DataFrame,
    base_dir: str,
    run_group: str = "default",
    run_id: str = "r0",
    mode: str = "documento_completo",
    n_buckets: int = 4,
    max_buckets: int | None = None,
) -> dict:
    """Extract `documents` bucket-by-bucket with checkpoint/resume.

    `max_buckets` caps how many *new* buckets this invocation processes —
    the kill-at-50% test uses it to simulate a dying job. Returns a summary
    {processed: [...], skipped: [...]}.
    """
    from ..operators.pipeline import ocr_media_spans, reassemble
    from ..sources.interleave import build_media, flat_spans

    done = completed_buckets(spark, base_dir, run_group)
    docs_b = documents.withColumn("bucket", _bucket_of(F.col("doc_id").cast("string"), n_buckets))
    processed, skipped = [], []
    out_path = os.path.join(base_dir, "output")
    lineage_path = os.path.join(base_dir, "lineage")
    metrics_path = os.path.join(base_dir, "metrics")
    for b in range(n_buckets):
        if b in done:
            skipped.append(b)
            continue
        if max_buckets is not None and len(processed) >= max_buckets:
            break
        subset = docs_b.filter(F.col("bucket") == b).drop("bucket")
        t0 = time.perf_counter()
        flat = flat_spans(subset)
        media = build_media(subset)
        ocr_out = ocr_media_spans(
            flat.filter(F.col("kind") == "media"), media, mode=mode
        ).cache()
        result = reassemble(flat, ocr_out)
        result.withColumn("bucket", F.lit(b)).withColumn(
            "run_id", F.lit(run_id)
        ).write.mode("append").parquet(out_path)
        # per-partition OCR metrics (the reference's metrics.log_request twin)
        metrics = (
            ocr_out.groupBy("partition_id", "route")
            .agg(
                F.count("*").alias("n_spans"),
                F.round(F.avg("mean_conf"), 2).alias("avg_conf"),
                F.round(F.sum("ocr_ms"), 1).alias("sum_ocr_ms"),
                F.round(F.max("ocr_ms"), 1).alias("max_ocr_ms"),
                F.sum("n_words").alias("n_words"),
            )
            .withColumn("run_group", F.lit(run_group))
            .withColumn("run_id", F.lit(run_id))
            .withColumn("bucket", F.lit(b))
        )
        metrics.write.mode("append").parquet(metrics_path)
        # count from the committed files — counting `result` would re-execute
        # the whole extraction a second time
        n_docs = (
            spark.read.parquet(out_path)
            .filter((F.col("bucket") == b) & (F.col("run_id") == run_id))
            .count()
        )
        n_media = ocr_out.count()
        ocr_out.unpersist()
        wall_ms = round((time.perf_counter() - t0) * 1e3, 1)
        lineage = spark.createDataFrame(
            [(run_group, run_id, b, n_docs, n_media, wall_ms, "done")],
            "run_group string, run_id string, bucket int, n_docs long, "
            "n_media long, wall_ms double, status string",
        )
        lineage.write.mode("append").parquet(lineage_path)
        processed.append(b)
    return {"processed": processed, "skipped": skipped}


def read_output(spark: SparkSession, base_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(base_dir, "output"))


def read_lineage(spark: SparkSession, base_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(base_dir, "lineage"))


def read_metrics(spark: SparkSession, base_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(base_dir, "metrics"))
