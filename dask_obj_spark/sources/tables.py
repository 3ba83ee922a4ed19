"""Driver test-data tables (TESTDATA.md / FIXTURES.md §1).

``load_table(spark, sf_dir, name)`` reads one parquet table;
``register_views`` registers all of them as temp views so ``spark.sql``
queries look identical to the DuckDB oracle SQL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_timestamps(df: DataFrame, nanos_cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Normalize timestamp columns to plain TimestampType.

    The driver's parquet has shipped two physical encodings across rounds:
    TIMESTAMP(NANOS) (readable only via nanosAsLong → bigint) and
    TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ by
    Spark 4's NTZ inference). Both are naive wall-clock values meaning
    UTC instants; `unix_micros`, `withWatermark`, and window functions
    require TimestampType, so convert here — once, at the source — instead
    of sprinkling casts through every operator."""
    from pyspark.sql import functions as F

    needs_tz_pin = any(
        dtype == "timestamp_ntz" or (dtype == "bigint" and col in nanos_cols)
        for col, dtype in df.dtypes
    )
    if needs_tz_pin:
        # The NTZ→TIMESTAMP cast interprets naive values in the session
        # timezone; the naive values MEAN UTC instants (matching DuckDB's
        # naive-as-UTC epoch()), so pin the session TZ here rather than
        # assuming the caller's session is already UTC.
        df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            # NTZ → TIMESTAMP: interpreted in session TZ (pinned UTC above),
            # preserving the naive-as-UTC instant DuckDB sees
            df = df.withColumn(col, F.col(col).cast("timestamp"))
        elif dtype == "bigint" and col in nanos_cols:
            # TIMESTAMP(NANOS) read via nanosAsLong → µs-granular epoch.
            # Integer division: (col / 1000).cast('long') would round-trip
            # through a double, whose ULP at ~1.7e18 ns is ≈256 ns — enough
            # to truncate k·1000 ns to k-1 µs and shift bucket boundaries.
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts was parquet TIMESTAMP(NANOS) in some data drops, which
        # Spark refuses by default; runtime conf so it also works on
        # caller-provided sessions (e.g. the driver's vanilla session)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return normalize_timestamps(df)


def fan_out(df: DataFrame) -> DataFrame:
    """Scale-adaptive parallelism floor for CPU-heavy chains over small
    scans (optimization r15; guide §2.5 input skew / §6 split sizing).

    A table smaller than one parquet split runs every narrow stage
    downstream of its scan at the SPLIT COUNT — on this workload a
    single sub-128MB file pinned whole regex/shingle/codec passes to ONE
    task on a 32-core host (measured: the b24 shingle explode was a
    3.2 s single-task stage; b10's scrub chain 5.7 s).  When the scan
    already has at least one split per core — any production-scale
    table — this returns ``df`` unchanged, so no shuffle is ever added
    at scale; below that it round-robins to ``defaultParallelism``
    partitions (row-preserving: values, and therefore oracle hashes,
    are unchanged)."""
    ncores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= ncores:
        return df
    return df.repartition(ncores)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view named after the table."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
