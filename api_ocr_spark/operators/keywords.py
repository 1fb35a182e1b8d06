"""Corpus keyword / vocabulary operators — TF-IDF top terms per document
and global top-K vocabulary. All JVM-side Catalyst.

The reference has no corpus-statistics layer (per-request service); these
extend the training-data tier: vocabulary tables feed tokenizer training,
per-doc salient terms feed topic balancing / cluster labeling.

Oracle-exactness note: the classic idf = ln(N/df) is NOT used — libm's ln
can differ in the last ulp between the JVM and DuckDB, which a value-hash
compare would catch. The score here is the exact-rational form
(tf / doc_len) * (N / df): integer-to-double division and one
multiplication are correctly-rounded IEEE ops, bit-identical in both
engines. Rank order is identical to the ln form for fixed N (both
monotone in tf/doc_len * N/df), so the top-k set is the same documents'
top-k — only the reported score scale differs (pinned deviation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens
from .dedup import _fan_out


def doc_term_freqs(documents: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term, tf, doc_len): per-document term counts. doc_len is
    computed BEFORE the explode (size of the token array — one cheap
    expression) and carried through the aggregate as first(), avoiding a
    second pass or a self-join. One shuffle with map-side partial agg."""
    t = tokens(F.col(text_col))
    return (
        _fan_out(documents)
        .select(F.col(id_col).cast("long").alias("doc_id"),
                F.size(t).cast("long").alias("doc_len"),
                F.explode(t).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.first("doc_len").alias("doc_len"))
    )


def tfidf_top_terms(documents: DataFrame, k: int = 5,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top-k salient terms per document by exact-rational TF-IDF (module
    docstring): score = (tf / doc_len) * (N / df), ranked (score desc,
    term asc — total order, tie-free).

    Shape at 100 TB: doc-term counts (one shuffle, partial agg), document
    frequencies derived FROM that frame (groupBy term — the (doc,term)
    rows are already distinct so count(*) IS the df), equi-join tf x df on
    term (AQE skew-splittable; stopword terms are the hot keys), then
    rank<=k per doc plans as partial+final WindowGroupLimit — each map
    task forwards at most k rows per doc. N is one driver-side count
    (a scalar, not a collect of rows)."""
    tf = doc_term_freqs(documents, text_col, id_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = documents.count()
    scored = tf.join(dfreq, "term").select(
        "doc_id", "term", "tf", "df",
        ((F.col("tf") / F.col("doc_len"))
         * (F.lit(n_docs) / F.col("df"))).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", F.col("tf").cast("long").alias("tf"),
                F.col("df").cast("long").alias("df"), "score", "rank")
    )


def vocab_topk(documents: DataFrame, k: int = 100,
               text_col: str = "text") -> DataFrame:
    """Global top-K vocabulary by corpus term count (count desc, term asc —
    deterministic under ties), with document frequency. The sort+limit
    plans as TakeOrderedAndProject: each partition keeps its local top-K and
    only K rows per partition reach the driver-side merge — the global
    sort never materializes (plan-asserted). Feeds tokenizer training /
    stopword induction."""
    t = tokens(F.col(text_col))
    counts = (
        _fan_out(documents)
        .select(F.col("doc_id").cast("long").alias("doc_id"),
                F.explode(t).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("n_occurrences"),
             F.countDistinct("doc_id").cast("long").alias("n_docs"))
    )
    return (counts
            .orderBy(F.col("n_occurrences").desc(), "term")
            .limit(k))
