"""SparkSession builder tuned for the engine.

Single place where execution-level knobs live so tests, bench.py and the
driver entry all run the same configuration. Designed for a multi-executor
cluster (AQE, skew-join handling, Arrow batching); tested on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import DEFAULT_SHUFFLE_PARTITIONS


def get_spark(
    app_name: str = "contextinator-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so the
    driver/bench can rerun the identical job at two parallelism levels for
    the scaling-efficiency evidence (BASELINE.md).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalescing + skew-join splitting backstop (our salting
        # is primary and deterministic; AQE catches what sampling missed).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow: all pandas UDFs ride vectorized batches.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # parquet scan sizing for ~100TB inputs: bigger splits, fewer tasks
        .config("spark.sql.files.maxPartitionBytes", "256m")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
