"""Time-window operators over the ``events`` table (SURVEY.md §2 Tier E:
streaming category — absent in the reference, whose only abstractions are
bag/delayed/expr, `/root/reference/src/dask_obj/core.py:34-220`).

Two layers:

1. **Batch window queries** (oracle-checked): tumbling / sliding /
   session windows computed with the SAME built-ins Structured Streaming
   uses (``F.window``, ``F.session_window``), run on the static table.
   This is the SURVEY §7 step-8 strategy: validate windowed-agg semantics
   in batch mode against DuckDB before trusting them in a stream.
   Window boundaries are emitted as **epoch seconds** so results compare
   engine- and timezone-independently.

2. **Streaming entry points**: ``events_stream`` (file-source readStream
   of the same parquet), ``stream_tumbling_counts`` (watermark + windowed
   agg). Tested with ``trigger(availableNow=True)`` into a memory sink and
   asserted equal to the batch query — the standard batch/stream parity
   contract of Structured Streaming.

Scale notes: windowed aggregation shuffles on (window, key) — partial
aggregation happens map-side, so cardinality, not row count, sizes the
shuffle. Watermarks bound state for true streams; session windows merge
state per key and the watermark expires closed sessions, so state is
O(open sessions), not O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_obj_spark.queries import query
from dask_obj_spark.sources import load_table

# -- batch window operators ---------------------------------------------------


def tumbling_agg(
    df: DataFrame, ts_col: str, key_col: str, width: str = "5 minutes"
) -> DataFrame:
    """Tumbling-window count+sum per key; window start/end as epoch secs."""
    w = F.window(ts_col, width)
    return (
        df.groupBy(w.alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.unix_timestamp("w.start").alias("w_start"),
            F.unix_timestamp("w.end").alias("w_end"),
            key_col,
            "n",
            "sum_value",
        )
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    width: str = "10 minutes",
    slide: str = "5 minutes",
) -> DataFrame:
    """Sliding-window count per key (each row lands in width/slide windows)."""
    w = F.window(ts_col, width, slide)
    return (
        df.groupBy(w.alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("w.start").alias("w_start"), key_col, "n")
    )


def session_agg(df: DataFrame, ts_col: str, key_col: str, gap: str = "30 minutes") -> DataFrame:
    """Session windows (gap timeout) per key: start/end = first/last event
    in the session (F.session_window end includes the gap; we report the
    observed extent, which is what the gaps-and-islands oracle computes)."""
    w = F.session_window(ts_col, gap)
    return (
        df.groupBy(w.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.unix_timestamp(F.min(ts_col)).alias("sess_start"),
            F.unix_timestamp(F.max(ts_col)).alias("sess_end"),
        )
        .select(key_col, "sess_start", "sess_end", "n")
    )


# -- streaming entry points ---------------------------------------------------


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a file-source stream (same rows as the batch
    table, delivered as a stream — the batch/stream parity harness)."""
    import os

    load_table(spark, sf_dir, "events")  # sets the nanosAsLong conf
    # schema must match the PHYSICAL file (ts as INT64 nanos) — the
    # TimestampType conversion happens inside stream_tumbling_counts
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    return (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def stream_tumbling_counts(
    stream: DataFrame,
    width: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling counts by event_type — the canonical
    late-data-tolerant streaming aggregation. State per (window, key) is
    dropped once the watermark passes window end."""
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("w.start").alias("w_start"), "event_type", "n")
    )


def stream_stateful_user_counts(stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    a per-user running event count that survives across micro-batches
    (the template for arbitrary keyed state — sessionizers, CEP,
    online aggregates Spark has no built-in for).

    State is one bigint per user; at scale state lives in the state
    store (RocksDB-backed on a real cluster), partitioned by the
    groupBy key, and this op introduces exactly one shuffle."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        import pandas as _pd

        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield _pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        "user_id bigint, n_events bigint",
        "n bigint",
        "update",
        GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(
    spark: SparkSession, sdf: DataFrame, name: str, mode: str = "complete"
) -> DataFrame:
    """Drain a stream with availableNow into a memory sink; return the
    materialized result table (test/demo harness, not a production sink)."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_click_purchase_join(
    clicks: DataFrame, purchases: DataFrame, within: str = "10 minutes"
) -> DataFrame:
    """Stream-stream inner join: each purchase matched to the clicks by
    the same user in the preceding `within` interval. Watermarks on both
    sides + the time-range join condition bound the buffered state (rows
    older than watermark+range are evicted) — without them a
    stream-stream join would buffer forever."""

    def prep(s: DataFrame) -> DataFrame:
        if dict(s.dtypes).get("ts") == "bigint":
            s = s.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
        return s

    c = (
        prep(clicks)
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", within)
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"))
    )
    p = (
        prep(purchases)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", within)
        .select("event_id", F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") < F.col("p_ts"))
        & (F.col("click_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {within}")),
    ).select(
        "event_id",
        F.col("p_user").alias("user_id"),
        F.unix_timestamp("p_ts").alias("purchase_ts"),
        F.unix_timestamp("click_ts").alias("click_ts"),
    )


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table as a file-source stream."""
    import os

    schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def stream_dedup_upsert(
    spark: SparkSession, stream: DataFrame, target_dir: str
) -> None:
    """foreachBatch sink: streaming exact dedup into a parquet target.

    Per micro-batch: hash content, drop in-batch duplicates, anti-join
    against the hashes already in the target, append only novel rows —
    the standard idempotent streaming-upsert pattern (content-keyed, so
    replays/retries cannot double-insert). At scale the target is a
    table bucketed by content_hash so the anti-join is exchange-free
    (operators/scale.py), or a Delta/Iceberg MERGE where available."""
    from pyspark.sql import functions as F  # noqa: F811 (worker-safe import)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select(
            "doc_id", F.md5(F.col("text")).alias("content_hash")
        ).dropDuplicates(["content_hash"])
        try:
            existing = batch_df.sparkSession.read.parquet(target_dir).select(
                "content_hash"
            )
            batch = batch.join(existing, "content_hash", "left_anti")
        except Exception:
            pass  # first batch: target does not exist yet
        batch.write.mode("append").parquet(target_dir)

    q = (
        stream.writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .option("checkpointLocation", target_dir + "_ckpt")
        .start()
    )
    q.awaitTermination()


def stream_dedup_within_watermark(
    stream: DataFrame, keys: list[str], watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming dedup with BOUNDED state: dropDuplicatesWithinWatermark
    keeps the first row per key and evicts each key's state once the
    event-time watermark passes it — unlike plain dropDuplicates on a
    stream, whose state grows with every key ever seen. The operator for
    "the same event may be redelivered within N minutes" (at-least-once
    sources), and the streaming face of the exact-dedup operator family
    (operators/dedup.py)."""
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


# ============================== queries ======================================


@query(
    "window_tumbling_events",
    oracle="""
    SELECT epoch(time_bucket(INTERVAL '5 minutes', ts))::BIGINT AS w_start,
           epoch(time_bucket(INTERVAL '5 minutes', ts))::BIGINT + 300 AS w_end,
           event_type,
           count(*) AS n,
           round(sum(value), 6) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def window_tumbling_events_q(spark, sf_dir):
    """BASELINE.md B8: tumbling 5-min window count+sum by event_type."""
    ev = load_table(spark, sf_dir, "events")
    return tumbling_agg(ev, "ts", "event_type", "5 minutes")


@query(
    "window_sliding_events",
    oracle="""
    WITH b AS (
      SELECT event_type,
             epoch(time_bucket(INTERVAL '5 minutes', ts))::BIGINT AS bucket
      FROM events
    ), exploded AS (
      SELECT event_type, unnest([bucket, bucket - 300]) AS w_start FROM b
    )
    SELECT w_start, event_type, count(*) AS n
    FROM exploded GROUP BY w_start, event_type
    """,
)
def window_sliding_events_q(spark, sf_dir):
    """Sliding 10-min/5-min window counts: every event contributes to the
    two windows covering it (oracle enumerates both starts per row)."""
    ev = load_table(spark, sf_dir, "events")
    return sliding_agg(ev, "ts", "event_type", "10 minutes", "5 minutes")


@query(
    "window_session_events",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ), numbered AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
      FROM flagged
    )
    SELECT user_id,
           floor(epoch(min(ts)))::BIGINT AS sess_start,
           floor(epoch(max(ts)))::BIGINT AS sess_end,
           count(*) AS n
    FROM numbered GROUP BY user_id, sess_no
    """,
)
def window_session_events_q(spark, sf_dir):
    """Session windows (30-min inactivity gap) per user via
    F.session_window; oracle is the equivalent gaps-and-islands SQL."""
    ev = load_table(spark, sf_dir, "events")
    return session_agg(ev, "ts", "user_id", "30 minutes")
