"""Structured Streaming tests: windowed aggregation, session windows,
stateful operator, foreachBatch snapshot sink — all driven to completion on
the finite events parquet (guide: memory sink + processAllAvailable)."""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from trino_iceberg_spark.catalog.snapshots import SnapshotTable
from trino_iceberg_spark.sources.testdata import load_table
from trino_iceberg_spark.streaming.events import (
    session_windows,
    stream_events,
    stream_into_snapshot_table,
    tumbling_counts,
)
from trino_iceberg_spark.streaming.stateful import running_user_totals


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    os.symlink(os.path.join(sf_dir, "events.parquet"), d / "events.parquet")
    return str(d)


@pytest.fixture(scope="module")
def raw_schema(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema


def _run_to_memory(agg, mode="complete"):
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = agg.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return name


def test_tumbling_counts_match_batch(spark, sf_dir, events_stream_dir, raw_schema):
    stream = stream_events(spark, events_stream_dir, raw_schema)
    name = _run_to_memory(tumbling_counts(stream, "1 hour"))
    streamed = {
        (r["w"]["start"], r["event_type"]): (r["cnt"], round(r["total_value"], 4))
        for r in spark.table(name).collect()
    }
    batch = {
        (r["ws"], r["event_type"]): (r["cnt"], round(r["tv"], 4))
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("ws"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("tv"),
        )
        .collect()
    }
    assert streamed == batch


def test_session_windows_bound_state(spark, events_stream_dir, raw_schema):
    stream = stream_events(spark, events_stream_dir, raw_schema)
    name = _run_to_memory(session_windows(stream, gap="30 minutes"))
    rows = spark.table(name).collect()
    assert rows
    # session windows are per-user, non-overlapping, ≥1 event
    assert all(r["events_in_session"] >= 1 for r in rows)


def test_stateful_running_totals(spark, sf_dir, events_stream_dir, raw_schema):
    stream = stream_events(spark, events_stream_dir, raw_schema)
    totals = running_user_totals(stream.select("user_id", "value"))
    name = _run_to_memory(totals, mode="update")
    # last emitted row per user == lifetime totals == batch groundtruth
    latest = {}
    for r in spark.table(name).collect():
        latest[r["user_id"]] = (r["lifetime_events"], r["lifetime_value"])
    batch = {
        r["user_id"]: (r["n"], r["v"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert set(latest) == set(batch)
    for uid, (n, v) in batch.items():
        ln, lv = latest[uid]
        assert ln == n and abs(lv - v) < 1e-6


def test_foreachbatch_snapshot_sink(spark, events_stream_dir, raw_schema, tmp_path):
    stream = stream_events(spark, events_stream_dir, raw_schema)
    agg = tumbling_counts(stream, "1 hour")
    table = SnapshotTable(spark, str(tmp_path / "stream_sink"))
    q = stream_into_snapshot_table(
        agg,
        table,
        query_name=f"sink_{uuid.uuid4().hex[:8]}",
        transform=lambda df: df.select(F.col("w.start").alias("window_start"), "event_type", "cnt", "total_value"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = table.read()
    assert out.count() > 0
    assert set(out.columns) == {"window_start", "event_type", "cnt", "total_value"}


def test_streaming_dedup_drops_redelivered(spark, sf_dir, tmp_path, raw_schema):
    """Feed the same events file twice (an at-least-once redelivery);
    dropDuplicatesWithinWatermark must emit each event_id exactly once."""
    from trino_iceberg_spark.streaming.events import stream_events, streaming_dedup

    d = tmp_path / "redelivered"
    d.mkdir()
    src = os.path.join(sf_dir, "events.parquet")
    os.symlink(src, d / "a.parquet")
    os.symlink(src, d / "b.parquet")

    stream = stream_events(spark, str(d), raw_schema, max_files_per_trigger=1)
    deduped = streaming_dedup(stream, ["event_id"], watermark="365 days")
    name = _run_to_memory(deduped.select("event_id"), mode="append")
    emitted = spark.table(name).collect()
    n_unique = spark.read.parquet(src).select("event_id").distinct().count()
    assert len(emitted) == n_unique
    assert len({r["event_id"] for r in emitted}) == n_unique


def test_stream_ingest_appends_and_replay_is_idempotent(
    spark, events_stream_dir, raw_schema, tmp_path
):
    from trino_iceberg_spark.streaming.events import stream_ingest_into_snapshot_table

    stream = stream_events(spark, events_stream_dir, raw_schema)
    table = SnapshotTable(spark, str(tmp_path / "ingest_sink"))
    qname = f"ingest_{uuid.uuid4().hex[:8]}"
    q = stream_ingest_into_snapshot_table(stream, table, qname)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n = table.read().count()
    assert n == spark.read.parquet(events_stream_dir).count()
    # a second run with NO checkpoint re-reads the same files with the
    # same batch ids — the committed-batch markers must skip every one
    stream2 = stream_events(spark, events_stream_dir, raw_schema)
    q2 = stream_ingest_into_snapshot_table(stream2, table, qname)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert table.read().count() == n  # no double-append on replay


def test_stream_rollup_converges_and_replay_is_idempotent(
    spark, events_stream_dir, raw_schema, tmp_path
):
    from pyspark.sql import functions as F

    from trino_iceberg_spark.streaming.events import stream_rollup_into_snapshot_table

    stream = stream_events(spark, events_stream_dir, raw_schema)
    table = SnapshotTable(spark, str(tmp_path / "rollup_sink"))
    qname = f"rollup_{uuid.uuid4().hex[:8]}"
    q = stream_rollup_into_snapshot_table(stream, table, qname)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    from trino_iceberg_spark.sources.testdata import load_table

    raw = spark.read.parquet(events_stream_dir)
    ts = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000"))) if dict(raw.dtypes).get("ts") == "bigint" else raw
    expected = {
        (r["bucket"], r["event_type"]): (r["cnt"], r["value_sum"])
        for r in ts.groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("decimal(38,4)").alias("value_sum"),
        )
        .collect()
    }
    got = {
        (r["bucket"], r["event_type"]): (r["cnt"], r["value_sum"])
        for r in table.read().collect()
    }
    assert got == expected  # incremental refreshes == from-scratch rollup
    # replay with no checkpoint: same batch ids -> every refresh skipped
    before = table.current_snapshot().snapshot_id
    q2 = stream_rollup_into_snapshot_table(
        stream_events(spark, events_stream_dir, raw_schema), table, qname
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert table.current_snapshot().snapshot_id == before


def test_checkpoint_restart_resumes_and_stays_exactly_once(spark, sf_dir, tmp_path):
    """Real recovery: a checkpointed ingest query is STOPPED after the
    first micro-batch, then restarted with the same checkpoint — Spark
    resumes from committed offsets (batch 0 is not re-read), the second
    file lands as the next batch, and the final table equals the batch
    recompute with no duplicates."""
    import os
    import time

    from pyspark.sql import functions as F

    from trino_iceberg_spark.catalog.snapshots import SnapshotTable
    from trino_iceberg_spark.sources.testdata import load_table
    from trino_iceberg_spark.streaming.events import stream_ingest_into_snapshot_table

    e = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    stage = str(tmp_path / "stage")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stage)
    e.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(stage)
    table = SnapshotTable(spark, str(tmp_path / "tbl"))

    def start():
        stream = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stage)
        )
        return stream_ingest_into_snapshot_table(
            stream, table, "ckpt_restart_q", checkpoint_dir=ckpt
        )

    q1 = start()
    q1.processAllAvailable()
    q1.stop()
    first_commits = len(table.snapshots())
    assert first_commits >= 1 and table.read().count() == e.filter("event_id % 2 = 0").count()

    # second file arrives while the query is DOWN; restart from checkpoint
    e.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(stage)
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    assert table.read().count() == e.count()  # no loss, no duplicates
    batch_ids = [
        int(s.properties["streaming.batch-id"])
        for s in table.snapshots()
        if (s.properties or {}).get("streaming.query") == "ckpt_restart_q"
    ]
    # resumed, not replayed: batch ids strictly increase across the restart
    assert sorted(batch_ids) == batch_ids and len(batch_ids) == len(set(batch_ids))
    assert len(table.snapshots()) == first_commits + 1  # exactly one new commit


def test_streaming_upsert_merge_on_read_append_only_commits(spark, tmp_path):
    """Streaming CDC upsert with write.merge.mode=merge-on-read: the
    foreachBatch merge sink commits equality-delete + append per batch —
    append-only data files (the Flink-Iceberg upsert write shape; no
    micro-batch ever rewrites the table) — and the final state equals
    the copy-on-write twin's latest-row-per-key result."""
    from pyspark.sql import Window

    stage = tmp_path / "stage"
    stage.mkdir()
    rows1 = [(1, "a", 10), (2, "a", 10), (3, "a", 10)]
    rows2 = [(2, "b", 20), (4, "b", 20)]  # upserts key 2, inserts key 4
    spark.createDataFrame(rows1, "user_id long, ev string, ts long").coalesce(
        1
    ).write.parquet(str(stage / "b1"))
    spark.createDataFrame(rows2, "user_id long, ev string, ts long").coalesce(
        1
    ).write.parquet(str(stage / "b2"))

    def run(table: SnapshotTable) -> None:
        w = Window.partitionBy("user_id").orderBy(F.col("ts").desc())
        schema = "user_id long, ev string, ts long"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stage / "*"))
        )

        def upsert(batch, _bid):
            latest = (
                batch.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            if table.current_snapshot() is None:
                table.append(latest)
            else:
                table.merge(latest, ["user_id"])

        q = stream.writeStream.foreachBatch(upsert).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    mor = SnapshotTable(spark, str(tmp_path / "mor"))
    mor.set_table_property("write.merge.mode", "merge-on-read")
    run(mor)
    cow = SnapshotTable(spark, str(tmp_path / "cow"))
    run(cow)

    got = sorted(tuple(r) for r in mor.read().collect())
    assert got == sorted(tuple(r) for r in cow.read().collect())
    assert {r[0] for r in got} == {1, 2, 3, 4}
    # every MOR merge commit kept the prior files (append-only) and the
    # merge snapshots carry equality deletes
    snaps = mor.main_ancestry()
    for prev, cur in zip(snaps, snaps[1:]):
        assert set(prev.files) <= set(cur.files)
    assert any(s.equality_deletes for s in snaps)
