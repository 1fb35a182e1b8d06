"""Stage-by-stage timing of setsim_join at a given SF (guide 1.1 empirical
loop). Each stage is forced with a noop-equivalent count; informal (ungated)
numbers for optimization triage only.

Usage: python tools/profile_setsim.py [sf_dir]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from api_ocr_spark.operators import dedup  # noqa: E402
from api_ocr_spark.operators.pipeline import release_persisted  # noqa: E402
from api_ocr_spark.plans.session import get_spark  # noqa: E402


def t(label, df):
    t0 = time.perf_counter()
    n = df.count()
    print(f"{label:28s} {time.perf_counter() - t0:7.2f}s  rows={n}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    spark = get_spark(app_name="profile-setsim", cores=32)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # warm
    docs.limit(64).count()

    t0 = time.perf_counter()
    sets = dedup._prefix_filter_sets(docs)
    t("sets (tokenize+persist)", sets)
    toks = sets.select("doc_id", F.explode("ts").alias("term"))
    t("toks explode", toks)
    census = toks.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    t("df census", census)
    postings = dedup._sorted_postings(sets)
    t("sorted postings", postings)
    prefix = dedup._prefix_postings(postings, 3, 5)
    t("prefix postings", prefix)
    raw = (
        prefix.alias("x").join(prefix.alias("y"), "term")
        .where((F.col("x.doc_id") < F.col("y.doc_id"))
               & (F.lit(3) * F.greatest("x.n", "y.n")
                  <= F.lit(5) * F.least("x.n", "y.n")))
        .select(F.col("x.doc_id").alias("doc_a"),
                F.col("y.doc_id").alias("doc_b"),
                "term", F.col("x.pos").alias("pa"), F.col("y.pos").alias("pb"),
                F.col("x.n").alias("n_a"), F.col("y.n").alias("n_b"))
    )
    t("raw join (length-filtered)", raw)
    cand = (
        raw.groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count("*").alias("cnt"),
             F.max(F.struct("term", "pa", "pb")).alias("w1"))
        .where((F.col("cnt")
                + F.least(F.col("n_a") - F.col("w1.pa"),
                          F.col("n_b") - F.col("w1.pb"))) * F.lit(8)
               >= F.lit(3) * (F.col("n_a") + F.col("n_b")))
        .select("doc_a", "doc_b", "n_a", "n_b")
    )
    t("cand (positional-filtered)", cand)
    t("full setsim_join", dedup.setsim_join(docs))
    print(f"total {time.perf_counter() - t0:.2f}s")
    release_persisted()
    spark.stop()


if __name__ == "__main__":
    main()
