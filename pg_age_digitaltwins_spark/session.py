"""SparkSession factory with scale-oriented defaults.

Designed for a real cluster (100 TB north star) but testable on
``local[*]``: AQE on (runtime shuffle coalescing, skew-join splitting,
dynamic broadcast), Arrow on (fast Pandas UDF exchange), UTC session
timezone (deterministic timestamp semantics vs the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    # Adaptive execution: coalesce small shuffle partitions, split skewed
    # ones, convert sort-merge joins to broadcast at runtime.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any Pandas-UDF path (similarity / multimodal operators).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamps (oracle comparisons run in UTC).
    "spark.sql.session.timeZone": "UTC",
    # Graph dims (models) are tiny; keep default 10MB broadcast threshold,
    # AQE will upgrade larger eligible sides at runtime.
    "spark.sql.autoBroadcastJoinThreshold": "10485760",
    # The driver's events.parquet carries TIMESTAMP(NANOS), which the
    # vectorized reader rejects; read as long and convert explicitly
    # (see store.tpch_loader.load_tables).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(app_name: str = "pg-age-digitaltwins-spark") -> SparkSession:
    """Return (or create) a SparkSession with engine defaults.

    On a cluster the master/shuffle-partition settings come from
    spark-submit; locally we default to ``local[$SPARK_GRAFT_CPUS]``
    with one shuffle partition per core.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    if not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
        builder = builder.config("spark.sql.shuffle.partitions", cpus)
        # local mode hosts ALL executor threads in the driver JVM: 32
        # concurrent tasks in an 8g heap is 250 MB/task, which GC-
        # thrashes on edge-sized checkpoints at sf1 (measured: Louvain
        # over 26M doubled edges).  16g ≈ 500 MB/task on a 128 GiB box;
        # on a real cluster spark-submit sizing overrides all of this.
        builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    for k, v in DEFAULT_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
