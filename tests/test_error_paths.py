"""Error rows, quarantine flow, streaming window metrics."""

import os

from pyspark.sql import functions as F

from api_ocr_spark.operators import pipeline
from api_ocr_spark.sources import interleave, tables


def test_corrupt_media_becomes_error_row_not_task_failure(spark, sf_dir):
    """A corrupt PNG must produce an error row (route='error:*', empty text)
    — never a task failure (the reference's degradation-over-exception
    stance, /root/reference/main.py:660-696)."""
    docs = tables.load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 6)
    flat = interleave.flat_spans(docs)
    media = interleave.build_media(docs)
    corrupt = media.withColumn(
        "bytes",
        F.when(F.col("media_ref").endswith("-0"), F.lit(b"not a png")).otherwise(F.col("bytes")),
    )
    out = pipeline.ocr_media_spans(
        flat.filter(F.col("kind") == "media"), corrupt, mode="basico")
    rows = out.collect()
    errors = [r for r in rows if r.route.startswith("error:")]
    oks = [r for r in rows if not r.route.startswith("error:")]
    assert errors, "expected at least one error row"
    assert all(r.ocr_text == "" and r.n_words == 0 for r in errors)
    assert oks, "healthy rows must still succeed"
    assert all(r.ocr_text for r in oks)


def test_extract_from_spans_matches_extract_documents(spark, sf_dir):
    docs = tables.load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    spans_table = interleave.build_documents_spans(docs)
    media = interleave.build_media(docs)
    via_spans = pipeline.extract_from_spans(spans_table, media, mode="basico")
    direct = pipeline.extract_documents(docs, mode="basico")
    a = via_spans.select("doc_id", "extracted_text")
    b = direct.select("doc_id", "extracted_text")
    assert a.count() == b.count() == 20
    assert a.exceptAll(b).count() == 0


def test_streaming_window_metrics(spark, sf_dir, tmp_path):
    from api_ocr_spark.streaming import stream as st

    docs = tables.load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    flat = interleave.flat_spans(docs)
    media = interleave.build_media(docs)
    joined = (
        flat.filter(F.col("kind") == "media")
        .select("doc_id", "offset", "media_ref")
        .join(media.select("media_ref", "bytes"), "media_ref")
        .withColumn("event_time", F.to_timestamp(F.lit("2026-01-01 00:00:30")))
        .select("doc_id", "offset", "media_ref", "bytes", "event_time")
    )
    in_dir = os.path.join(str(tmp_path), "win_in")
    joined.write.parquet(in_dir)
    q = (
        st.stream_ocr_with_window_metrics(spark, in_dir, window="1 minute")
        .writeStream.format("memory")
        .queryName("t_win")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_win").collect()
    # append mode emits only watermark-closed windows; with availableNow the
    # single open window may be withheld — accept either closed-row output or
    # verify through a complete-mode count instead
    if not got:
        q2 = (
            st.stream_ocr_with_window_metrics(spark, in_dir, window="1 minute")
            .writeStream.format("memory")
            .queryName("t_win2")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination()
        got = spark.table("t_win2").collect()
    assert len(got) == 1
    assert got[0].n_spans == joined.count()


def test_stateful_streaming_dedup(spark, sf_dir, tmp_path):
    """applyInPandasWithState first-seen dedup: duplicated input rows across
    files collapse to one output row per doc_id."""
    from api_ocr_spark.streaming import stream as st

    docs = tables.load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 8)
    flat = interleave.flat_spans(docs)
    media = interleave.build_media(docs)
    joined = (
        flat.filter(F.col("kind") == "media")
        .select("doc_id", "offset", "media_ref")
        .join(media.select("media_ref", "bytes"), "media_ref")
        .withColumn("event_time", F.current_timestamp())
        .select("doc_id", "offset", "media_ref", "bytes", "event_time")
    )
    dup = joined.unionByName(joined)  # every row twice
    in_dir = os.path.join(str(tmp_path), "dedup_in")
    dup.repartition(4).write.parquet(in_dir)
    q = (
        st.stream_dedup_first_seen(spark, in_dir)
        .writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_dedup").collect()
    doc_ids = [r.doc_id for r in got]
    assert len(doc_ids) == len(set(doc_ids))  # one row per doc
    assert set(doc_ids) == {str(i) for i in range(8) if any(
        (i + off) % 3 == 0 for off in range(20))}
