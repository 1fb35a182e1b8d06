"""Bucketed co-located join: the per-query shuffle disappears when both
sides are bucketed on the join key (plans/bucketing.py)."""

import io
import os
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from api_ocr_spark.plans import bucketing
from api_ocr_spark.sources import interleave, tables


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucket_db(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketdb")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckdb LOCATION '{loc}'")
    yield "buckdb"
    spark.sql("DROP DATABASE IF EXISTS buckdb CASCADE")


def test_cobucketed_join_has_no_exchange(spark, sf_dir, bucket_db):
    docs = tables.load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    media = interleave.build_media(docs)
    spans = interleave.flat_spans(docs).filter(F.col("kind") == "media").select(
        "doc_id", "offset", "media_ref")
    bucketing.write_bucketed(media, "buckdb.media_b", "media_ref", 8)
    bucketing.write_bucketed(spans, "buckdb.spans_b", "media_ref", 8)

    # broadcast would hide the property on these tiny tables — force the
    # SMJ path for the assertion, then restore the session threshold
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketing.cobucketed_join(spark, "buckdb.spans_b", "buckdb.media_b",
                                           "media_ref")
        txt = _plan(joined)
        assert "Exchange" not in txt, txt[:2000]
        assert "SortMergeJoin" in txt
        assert "Bucketed: true" in txt

        # and the join result equals the plain (shuffling) join
        plain = spans.join(media, "media_ref")
        assert joined.count() == plain.count()
        assert joined.select("doc_id", "offset", "media_ref").exceptAll(
            plain.select("doc_id", "offset", "media_ref")).count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_mismatched_bucket_count_still_correct(spark, sf_dir, bucket_db):
    """A bucket-count mismatch silently reintroduces the exchange on one
    side (Spark re-shuffles the smaller count) — correctness holds, and the
    test documents that the EXCHANGE-FREE property needs matching counts."""
    docs = tables.load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    media = interleave.build_media(docs)
    bucketing.write_bucketed(media, "buckdb.media_b4", "media_ref", 4)
    spans = interleave.flat_spans(docs).filter(F.col("kind") == "media").select(
        "doc_id", "media_ref")
    bucketing.write_bucketed(spans, "buckdb.spans_b8", "media_ref", 8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketing.cobucketed_join(
            spark, "buckdb.spans_b8", "buckdb.media_b4", "media_ref")
        assert joined.count() == spans.join(media, "media_ref").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
