"""SparkSession construction tuned for this engine.

Local test profile: one JVM, ``local[N]`` threads. The config below is
chosen so the same code scales to a real cluster: AQE handles runtime
partition coalescing and skew joins, Arrow makes the Python boundary
columnar, and shuffle partitions default to core count locally (a cluster
deployment would size this to ~2-3x total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "dask_obj_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's tuned defaults.

    Scale notes (100 TB design intent):
    - AQE on: runtime re-plan (partition coalescing, skew-join splitting,
      broadcast demotion/promotion) is the main lever when static stats lie.
    - Arrow on: every pandas/mapInPandas boundary is columnar batches.
    - UTC session timezone: deterministic timestamp semantics vs the
      DuckDB oracle and across cluster nodes.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
        # driver testdata stores events.ts as parquet TIMESTAMP(NANOS),
        # which Spark refuses by default; read as long (ns since epoch) and
        # convert in the loader (lossless: the data is µs-granular)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
