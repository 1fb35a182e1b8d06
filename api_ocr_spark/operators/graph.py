"""Host-level link-graph centrality (crawl prioritization).

The web-graph leg of a crawl pipeline: aggregate page-level outlinks into a
weighted host→host graph, then rank hosts by PageRank power iteration —
what CommonCrawl-scale crawls use to decide fetch priority (harmonic/
PageRank host rankings; Brin & Page 1998 for the recurrence).

Arithmetic is INTEGER throughout, deliberately: ranks start at r0, each
round a node sends `(r * damping_num * w) DIV (damping_den * out_w)` along
each out-edge (floored integer division — positive operands, so Spark's
DIV and DuckDB's // agree bit-for-bit) and collects `base + Σ shares`.
Floating-point PageRank sums in engine-dependent order; the floored-integer
twin is deterministic across engines, which is what makes the oracle an
equality check rather than a tolerance check. Dangling mass (hosts with no
out-edges) is dropped, as in the plain formulation — documented deviation
from the redistribute-everywhere variant.

Shape at 100 TB: the page→host-pair extraction is the heavy stage (one
map-side-partial groupBy over the corpus); the graph itself is ~10^7 hosts
— the rank/edge frames stay distributed DataFrames and each round is two
equi-joins + one aggregation on host keys, so the same code runs whether
the graph fits one executor or a thousand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_edges(pairs: DataFrame) -> DataFrame:
    """(src, dst) page-level pairs -> weighted host graph (src, dst, w).
    Map-side partial counts absorb boilerplate fan-in before the shuffle."""
    return pairs.groupBy("src", "dst").agg(F.count("*").alias("w"))


def pagerank_int(edges: DataFrame, iters: int = 3,
                 damping_num: int = 85, damping_den: int = 100,
                 r0: int = 1_000_000, base: int = 150_000) -> DataFrame:
    """Integer PageRank over a weighted edge frame (src, dst, w) —
    returns (host, pagerank, out_w, in_w) after `iters` rounds.

    Keep r0 * damping_num * max(w) below 2^63 (the defaults leave ~5
    orders of magnitude of headroom at corpus scale); DuckDB would raise
    on overflow while Spark wraps, so the bound is what keeps the twin
    exact."""
    # materialize the aggregated graph ONCE: every rank round and the
    # degree joins reference it, and without the cut each unrolled round
    # would re-run the corpus-wide pair extraction (the minhash shingle-
    # frame lesson — localCheckpoint, not cache, so the lineage is cut and
    # the plan shows a single source pass)
    edges = edges.localCheckpoint(eager=True)
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct())
    outw = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    inw = edges.groupBy("dst").agg(F.sum("w").alias("in_w"))
    ranks = nodes.select("node", F.lit(r0).cast("long").alias("r"))
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(outw, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(r * {damping_num} * w) "
                       f"DIV ({damping_den} * out_w)").alias("share"),
            )
            .groupBy("node").agg(F.sum("share").alias("s"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(base) + F.coalesce(F.col("s"), F.lit(0)))
            .cast("long").alias("r"),
        )
    return (
        ranks.join(outw, ranks["node"] == outw["src"], "left")
        .join(inw, ranks["node"] == inw["dst"], "left")
        .select(
            F.col("node").alias("host"),
            F.col("r").alias("pagerank"),
            F.coalesce(F.col("out_w"), F.lit(0)).cast("long").alias("out_w"),
            F.coalesce(F.col("in_w"), F.lit(0)).cast("long").alias("in_w"),
        )
    )
