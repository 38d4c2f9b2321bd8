"""Structured Streaming event analytics.

The engine's streaming surface (guide: readStream → watermark → window →
writeStream): tumbling/sliding/session windows over an event stream, plus
an exactly-once-style foreachBatch sink into a snapshot table. All
builders return running StreamingQuery handles or DataFrames ready to
start; tests drive them to completion with the finite parquet source.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog.snapshots import SnapshotTable

__all__ = [
    "stream_events",
    "tumbling_counts",
    "sliding_counts",
    "session_windows",
    "streaming_dedup",
    "stream_into_snapshot_table",
    "stream_ingest_into_snapshot_table",
]


def stream_events(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source event stream with the engine's ns→µs timestamp fix."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )
    ts_dtype = dict(stream.dtypes).get("ts")
    if ts_dtype == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_dtype == "timestamp_ntz":
        # withWatermark rejects TIMESTAMP_NTZ; session tz is pinned UTC so
        # the cast preserves the instant (same rationale as load_table).
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window counts/sums per event_type. The watermark bounds
    state: late rows beyond it are dropped and their windows finalized —
    required for unbounded streams (state would otherwise grow forever)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding (hopping) windows — each event lands in window/slide panes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Native session windows (gap-based) per user — the streaming
    counterpart of the batch w06_sessionize query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("events_in_session"))
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key's state only until the
    watermark passes it, so state size tracks the duplicate-arrival window
    (the at-least-once source retry window), NOT the stream's lifetime —
    the difference between a dedup that runs forever and one that OOMs.

    Use for ingest-side dedup of redelivered events before they reach a
    snapshot table; exactly-once sinks then only need batch idempotence."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_into_snapshot_table(
    agg: DataFrame,
    table: SnapshotTable,
    query_name: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
):
    """foreachBatch sink: each micro-batch commits atomically into a
    snapshot table (complete-mode replace per batch). The batch id +
    manifest commit give the effectively-once behavior a real deployment
    gets from Iceberg's transactional writes."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df) if transform else batch_df
        table.overwrite(out)

    return (
        agg.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .queryName(query_name)
        .start()
    )


def stream_ingest_into_snapshot_table(
    events: DataFrame,
    table: SnapshotTable,
    query_name: str,
    checkpoint_dir: str | None = None,
):
    """Append-mode streaming INGEST into a snapshot table with
    exactly-once batch semantics: each micro-batch appends as one atomic
    snapshot commit whose manifest carries the (query, batch-id) pair as
    snapshot PROPERTIES — the idempotence ledger is written by the same
    ``os.replace`` that commits the data, so there is no window where the
    rows are committed but the batch id is not. A replayed batch
    (checkpoint recovery, foreachBatch's at-least-once contract) is
    recognized from the snapshot log and skipped instead of
    double-appending. This is exactly how Iceberg/Delta streaming sinks
    get exactly-once: the batch id rides inside the table commit itself,
    never in a second file."""

    def last_committed_batch() -> int:
        last = -1
        for snap in table.snapshots():
            props = snap.properties or {}
            if props.get("streaming.query") == query_name:
                try:
                    last = max(last, int(props["streaming.batch-id"]))
                except (KeyError, ValueError):
                    continue
        return last

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if last_committed_batch() >= batch_id:
            return  # replayed batch: already in the snapshot log, skip
        table.append(
            batch_df,
            properties={
                "streaming.query": query_name,
                "streaming.batch-id": str(batch_id),
            },
        )

    writer = events.writeStream.outputMode("append").foreachBatch(sink)
    if checkpoint_dir:
        # Durable checkpoint -> a RESTARTED query resumes from committed
        # offsets (real recovery), instead of re-reading from scratch and
        # leaning on the ledger to skip every batch.
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.queryName(query_name).start()


def stream_rollup_into_snapshot_table(
    events: DataFrame,
    table: SnapshotTable,
    query_name: str,
    checkpoint_dir: str | None = None,
):
    """Streaming CONTINUOUS AGGREGATE: maintain an hourly
    ``(bucket, event_type, cnt, value_sum)`` rollup table from an event
    stream, refreshed incrementally per micro-batch — the
    TimescaleDB-continuous-aggregate / materialized-view pattern on the
    snapshot catalog, with the same exactly-once ledger as
    :func:`stream_ingest_into_snapshot_table` (batch id rides inside the
    atomic commit; replayed batches skip).

    Per batch the work is ∝ batch + rollup size, never raw history: the
    batch aggregates to its hourly delta (map-side combine), the delta
    full-merges with the CURRENT rollup (cells-sized — buckets × dims),
    and one overwrite commit publishes the refreshed aggregate. Exact
    DECIMAL sums make the merge order-independent, so any batch split of
    the same events converges to the identical table (pinned in
    tests/test_streaming.py)."""

    def last_committed_batch() -> int:
        last = -1
        for snap in table.snapshots():
            props = snap.properties or {}
            if props.get("streaming.query") == query_name:
                try:
                    last = max(last, int(props["streaming.batch-id"]))
                except (KeyError, ValueError):
                    continue
        return last

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("decimal(38,4)")
            .alias("value_sum"),
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if last_committed_batch() >= batch_id:
            return
        delta = rollup(batch_df)
        props = {
            "streaming.query": query_name,
            "streaming.batch-id": str(batch_id),
        }
        if table.current_snapshot() is None:
            table.overwrite(delta, properties=props)
            return
        merged = (
            table.read()
            .unionByName(delta)
            .groupBy("bucket", "event_type")
            .agg(
                F.sum("cnt").alias("cnt"),
                F.sum("value_sum").cast("decimal(38,4)").alias("value_sum"),
            )
        )
        table.overwrite(merged, properties=props)

    writer = events.writeStream.outputMode("append").foreachBatch(sink)
    if checkpoint_dir:
        # Durable checkpoint -> a RESTARTED query resumes from committed
        # offsets (real recovery), instead of re-reading from scratch and
        # leaning on the ledger to skip every batch.
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.queryName(query_name).start()
