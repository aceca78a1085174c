"""Structured Streaming ingestion surface — beyond-reference.

The reference lists Kafka/real-time ingestion as an unimplemented roadmap
item (README.md:823) and is batch full-reload only (README.md:829-832).
This module provides the streaming ingestion surface the north star asks
for (BASELINE.json: "Structured Streaming or batch DataFrame ingestion"):

- file-source ``readStream`` over events-shaped data (swap in Kafka with
  ``.format("kafka")`` — the transformations are source-agnostic),
- watermarked tumbling / sliding event-time windows for late data,
- streaming dedup keyed on event id within the watermark,
- session windows (built-in ``session_window``) as the stateful op.

Every transformation here is also valid on a batch DataFrame — the
batch twin ``events_tumbling_window`` in plans/contract_llm.py is
oracle-checked, which pins the semantics the streaming path inherits.

Scale posture: watermark bounds state; windows aggregate with map-side
partial combine; dedup state is (key -> max event-time) per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def stream_events(
    spark: SparkSession, source_dir: str, fmt: str = "parquet"
) -> DataFrame:
    """File-source event stream (one file per micro-batch discovery)."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENT_SCHEMA)
        .option("path", source_dir)
        .load()
    )


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregate (streaming or batch frame)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count("*").alias("event_count"),
            (F.round(F.sum("value"), 2) / F.count("*")).alias("avg_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_count",
            "avg_value",
            "approx_users",
        )
    )


def sliding_type_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding-window per-type counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("event_count"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_count",
        )
    )


def dedup_events(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon.

    The streaming analog of the reference's union+distinct customer dedup
    (etl_pipeline_spark.py:988-994): state is bounded by the watermark.
    """
    return events.withWatermark("ts", watermark).dropDuplicates(
        ["event_id", "ts"]
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user session windows (stateful op via built-in session_window)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("events_in_session"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "events_in_session",
            "session_value",
        )
    )


def run_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> None:
    """Drain a stream into an in-memory table with availableNow (for tests
    and batch-over-stream replays); blocks until all available data is
    processed."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
