"""SparkSession factory.

One place for every config that matters at scale:

- AQE on (runtime re-plan: shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast) — on a 1000-executor cluster this is what keeps a 100 TB
  shuffle from producing 200 fixed-size partitions.
- Arrow enabled — every pandas-UDF / toPandas boundary is Arrow-batched.
- UTC session timezone — parquet timestamps compare cleanly against external
  engines (the DuckDB oracle is UTC-naive).
- shuffle partitions sized from the env (local test rig = cores; a real
  cluster would size this from input volume / target partition size, see
  ``tune_shuffle_partitions``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# ~128 MB shuffle-partition target: the classic rule of thumb that keeps a
# partition comfortably in executor memory while amortizing task overhead.
TARGET_PARTITION_BYTES = 128 * 1024 * 1024


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "dsep-engine", **extra_conf: str) -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS) which Spark4 rejects by
        # default; read as long nanos, catalog.load converts to μs timestamps
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", str(TARGET_PARTITION_BYTES))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in extra_conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_shuffle_partitions(spark: SparkSession, input_bytes: int) -> None:
    """Size the shuffle for a given input volume (100 TB posture).

    AQE coalesces downward at runtime, so we only need the ceiling to be
    high enough that no partition exceeds the ~128 MB target.
    """
    parts = max(default_parallelism(), input_bytes // TARGET_PARTITION_BYTES + 1)
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
