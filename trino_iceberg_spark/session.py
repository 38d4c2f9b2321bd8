"""SparkSession bootstrap for the engine.

Replaces the reference's stack bootstrap (MinIO+Nessie+Trino container
orchestration, /root/reference/tests/IntegrationTests/TrinoIcebergStack.cs:125-146)
with a single local SparkSession builder. On a cluster the same builder is
used with a different master; every other knob is config, not code.

Scale notes (100 TB / 1000-executor design):
- AQE on: runtime partition coalescing, skew-join splitting, and
  dynamic join-strategy switching replace hand-tuning per query.
- ``spark.sql.shuffle.partitions`` defaults to ~cores locally; at cluster
  scale AQE's coalescing makes the initial number far less sensitive.
- Arrow enabled so Pandas-UDF extension operators (dedup / similarity)
  move batches, not rows.
- Session timezone pinned to UTC so results compare bit-stable against
  external oracles regardless of host TZ.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark", "DEFAULT_APP_NAME"]

DEFAULT_APP_NAME = "trino_iceberg_spark"


def _default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        try:
            return max(1, int(cpus))
        except ValueError:
            pass
    return os.cpu_count() or 8


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    warehouse_dir: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Mirrors the reference's ``TrinoIcebergStack.StartAsync`` role
    (TrinoIcebergStack.cs:125-146): after this returns, DDL/DML/queries work.
    """
    par = _default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{par}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or par))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Iceberg-style behavior on plain Spark: case-insensitive resolution like Trino.
        .config("spark.sql.caseSensitive", "false")
        # Pin the string-literal dialect the parameter renderer targets:
        # backslash IS an escape character (Spark default), and
        # formatting.render_literal escapes it. Pinning makes the
        # injection-safety contract independent of ambient config.
        .config("spark.sql.parser.escapedStringLiterals", "false")
        # Parquet TIMESTAMP(NANOS) (events.ts) is unreadable natively; read
        # as long and convert in the loader (sources/testdata.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if warehouse_dir:
        builder = builder.config("spark.sql.warehouse.dir", warehouse_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
