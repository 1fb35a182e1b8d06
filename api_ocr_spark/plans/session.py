"""SparkSession builder with the engine's scale-oriented defaults.

Tuned for the workload shape: megapixel binary rows flowing through Arrow
into Python workers (small Arrow batches, generous overhead), shuffles
dominated by the reassembly groupBy (AQE coalesce + skew split on), and
parquet scans that must keep pushdown/pruning (see SURVEY.md §4.2).

On a real cluster the same confs apply; only master/cores change
(spark-submit --py-files api_ocr_spark.zip job.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "api-ocr-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 32)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: post-shuffle coalesce, skew-join split, dynamic broadcast
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for all pandas UDF / mapInPandas stages; small batches because
        # rows carry encoded images (the distributed echo of the reference's
        # 512 MB memory fight, /root/reference/README.md:115-124)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    # Shuffle spill dir on tmpfs when available: local mode funnels all
    # shuffle I/O through one disk, which mis-models a cluster (where shuffle
    # bandwidth scales per node). RAM-backed local dirs restore that scaling.
    shm = "/dev/shm/spark-local"
    try:
        os.makedirs(shm, exist_ok=True)
        b = b.config("spark.local.dir", shm)
    except OSError:
        pass
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
