"""Structured Streaming operators over the events table.

The reference is strictly batch (one main() per query set — SURVEY.md §1),
so streaming is an ADDITION for pipeline completeness: the same windowed
aggregations a training-data ingest pipeline runs over event/telemetry
streams. Semantics are defined by the batch equivalents (tested equal via
Trigger.AvailableNow against a file source).

- tumbling-window counts with a watermark for late data
- session windows (built-in F.session_window) per user
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_stream(spark: SparkSession, events_dir: str, schema) -> DataFrame:
    """File-source stream over a directory of parquet event files."""
    return spark.readStream.schema(schema).parquet(events_dir)


def _with_event_time(events: DataFrame) -> DataFrame:
    """Watermarks need TIMESTAMP (not NTZ); session TZ is UTC so the cast
    is an identity relabel."""
    return events.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window per-type counts; watermark bounds late-event state.
    Works on both batch and streaming DataFrames (same plan)."""
    events = _with_event_time(events)
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("sum_value4"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value4",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows (gap-based), built-in session_window —
    the custom-stateful-operator slot; applyInPandasWithState would be the
    escape hatch for logic session_window can't express."""
    events = _with_event_time(events)
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("s.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame, name: str, spark: SparkSession
) -> DataFrame:
    """Drain an availableNow stream into an in-memory table; returns the
    result as a batch DataFrame (test/verification harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
