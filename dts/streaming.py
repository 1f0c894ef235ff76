"""Structured Streaming operators: event aggregations + index ingestion.

The reference is strictly batch (one main() per query set — SURVEY.md §1),
so streaming is an ADDITION for pipeline completeness. Semantics are
defined by the batch equivalents (tested equal via Trigger.AvailableNow
against a file source).

- tumbling-window counts with a watermark for late data
- session windows (built-in F.session_window) per user
- ``stream_ingest_index``: continuous document ingestion into the
  persisted inverted index (foreachBatch → build/merge, idempotent per
  batch id), streamed results bit-identical to a batch build (tested)
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


def stream_distinct_docs(
    stream: DataFrame, hash_col: str = "content_md5", n_shards: int = 64
) -> DataFrame:
    """Streaming exact dedup: emit only the FIRST arrival of each content
    hash across the WHOLE stream (within and across micro-batches and
    restarts) — the custom stateful operator slot (SURVEY §2: the logic
    session_window can't express), via ``applyInPandasWithState``.

    State is sharded by hash prefix (``pmod(xxhash64(hash), n_shards)``)
    so no single group holds the full seen-set; each group's state is the
    list of hashes seen in that shard, checkpointed by the streaming
    engine (restart-safe — tested). State grows with distinct corpus
    size by design (exact semantics); production variants bound it with a
    TTL timeout or a bloom-filter state at the cost of exactness — the
    same trade Lucene-style pipelines make.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = stream.schema

    def dedup_fn(key, pdfs, state):
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            keep = [
                h not in seen and (seen.add(h) or True)
                for h in pdf[hash_col]
            ]
            out = pdf.loc[keep, [f.name for f in out_schema.fields]]
            if len(out):
                yield out
        state.update((sorted(seen),))

    return (
        stream.withColumn(
            "_shard", F.pmod(F.xxhash64(F.col(hash_col)), F.lit(n_shards))
        )
        .groupBy("_shard")
        .applyInPandasWithState(
            dedup_fn,
            out_schema,
            "seen array<string>",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_ingest_index(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    doc_schema,
    checkpoint_dir: str,
    positions: bool = False,
    strip_literals: bool = False,
    bucket_size: int | None = None,
    available_now: bool = True,
):
    """Continuous index ingestion: readStream over a landing directory of
    parquet document files → foreachBatch → first batch ``build_index``,
    every later batch ``merge_index`` (incremental append; doc_ids
    continue from the current n_docs, postings land as extra runs per
    (term, bucket) — both scorers treat runs as ordered concatenations).

    Exactly-once across restarts is the standard idempotent-foreachBatch
    recipe: the streaming checkpoint makes the SOURCE exactly-once (each
    file is read into exactly one batch), and meta.json records
    ``last_stream_batch`` so a replayed batch (sink retry after a crash
    between merge and checkpoint commit) is skipped instead of
    double-merged. Periodic ``compact_index`` remains the maintenance
    story (restores bmw-safety after avgdl drift, same as batch merges).

    Returns the StreamingQuery; with ``available_now`` the caller can
    ``awaitTermination()`` to drain the backlog (test mode) — without it
    the query keeps watching ``source_dir`` (production mode).
    """
    from dts.index_build import build_index, load_meta, merge_index

    import os

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # The batch-id marker is committed in the SAME atomic meta.json
        # write as the build/merge itself (extra_meta) — a sink retry
        # after a crash can observe either "not merged, no marker" (it
        # re-merges) or "merged, marker present" (it skips), never the
        # double-merge middle state.
        marker = {"last_stream_batch": int(batch_id)}
        if os.path.exists(f"{index_dir}/meta.json"):
            last = load_meta(index_dir).get("last_stream_batch")
            if last is not None and batch_id <= last:
                return  # replayed batch: already merged
            merge_index(spark, index_dir, batch_df, extra_meta=marker)
        else:
            from dts.io import assign_doc_ids

            kw = {}
            if bucket_size is not None:
                kw["bucket_size"] = bucket_size
            build_index(
                spark,
                assign_doc_ids(batch_df),
                index_dir,
                positions=positions,
                strip_literals=strip_literals,
                extra_meta=marker,
                **kw,
            )

    stream = spark.readStream.schema(doc_schema).parquet(source_dir)
    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
