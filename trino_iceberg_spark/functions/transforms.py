"""Iceberg-style partition transforms as column expressions.

Iceberg tables declare partitioning as *transforms* of source columns —
``bucket(n, col)``, ``truncate(w, col)``, ``year/month/day/hour(col)``
(Iceberg spec §Partitioning; the reference's warehouse stores Iceberg
tables, SURVEY.md §1.1). Spark's hive-style writes partition by raw
column values; these helpers reproduce the transform layer so a
partitioned write gets Iceberg's layout properties: bounded partition
counts (bucket), prefix locality (truncate), and calendar pruning
(year/month/day/hour).

All are plain Column expressions — usable in ``partitionBy`` via
``withColumn`` and in predicates, where Catalyst prunes partitions on the
transform column exactly as it would on an Iceberg identity partition.

Note on ``bucket_transform``: Iceberg specifies Murmur3-32 seed 0;
Spark's ``F.hash`` is Murmur3-32 seed 42. The *distribution contract*
(same value → same bucket, uniform spread) is identical, but the bucket
ids differ from Java Iceberg's — mixing files written by both in ONE
table's metadata would mis-route reads, so don't. For tables this engine
writes and reads, the layout is self-consistent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bucket_transform",
    "truncate_transform",
    "year_transform",
    "month_transform",
    "day_transform",
    "hour_transform",
    "write_transform_partitioned",
]


def bucket_transform(col: Column | str, num_buckets: int) -> Column:
    """``bucket(n, col)``: stable hash of the value into [0, n)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.hash(c), F.lit(num_buckets)).cast("int")


def truncate_transform(col: Column | str, width: int, kind: str = "string") -> Column:
    """``truncate(w, col)``: strings → first ``w`` chars; integral types →
    ``value − pmod(value, w)`` (floors toward −inf like Iceberg, including
    negatives)."""
    c = F.col(col) if isinstance(col, str) else col
    if kind == "string":
        return F.substring(c, 1, width)
    return (c - F.pmod(c, F.lit(width))).cast("long")


def year_transform(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.year(c)


def month_transform(col: Column | str) -> Column:
    """``month(col)`` as a single orderable value (yyyy-MM)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM")


def day_transform(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("date")


def hour_transform(col: Column | str) -> Column:
    """``hour(col)`` as a single orderable value (yyyy-MM-dd-HH)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd-HH")


def write_transform_partitioned(
    df: DataFrame,
    path: str,
    transforms: dict[str, Column],
    mode: str = "errorifexists",
    fmt: str = "parquet",
) -> list[str]:
    """Write ``df`` partitioned by transform columns (added, then used as
    the hive partition keys). Returns the transform column names — filter
    on them for planning-time partition pruning.

    Example::

        cols = {"day": day_transform("ts"), "user_bkt": bucket_transform("user_id", 16)}
        write_transform_partitioned(events, path, cols)
        spark.read.parquet(path).filter(F.col("day") == "2024-01-05")  # pruned scan
    """
    out = df
    for name, expr in transforms.items():
        out = out.withColumn(name, expr)
    out.write.mode(mode).partitionBy(*transforms.keys()).format(fmt).save(path)
    return list(transforms.keys())
