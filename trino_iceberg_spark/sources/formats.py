"""Source/sink registry — schema-explicit readers and writers.

The reference's only storage format is Iceberg/Parquet on S3
(TrinoConfigurationProvider.cs:58); this module rounds out the engine's
source surface with the formats Spark ships (parquet/csv/json/orc) behind
one schema-first API: inference is opt-in only, because a schema-inference
pass over 100 TB is a full extra scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_source", "write_sink", "SUPPORTED_FORMATS"]

SUPPORTED_FORMATS = ("parquet", "csv", "json", "orc")


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read a path in a supported format.

    parquet/orc carry their own schema (self-describing, pushdown-capable);
    csv/json REQUIRE an explicit schema — passing none raises instead of
    silently triggering an inference scan."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED_FORMATS}")
    reader = spark.read
    opts = dict(options or {})
    if fmt == "csv":
        opts.setdefault("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json") and opts.get("inferSchema", "false") != "true":
        raise ValueError(
            f"{fmt} sources need an explicit schema (or options={{'inferSchema': 'true'}} "
            "to opt into an inference scan — avoid at scale)"
        )
    return reader.options(**opts).format(fmt).load(path)


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "errorifexists",
    partition_by: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """Write a DataFrame to a path. ``partition_by`` produces
    hive-partitioned layout (the physical partition-pruning contract)."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED_FORMATS}")
    writer = df.write.mode(mode).options(**(options or {}))
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)
