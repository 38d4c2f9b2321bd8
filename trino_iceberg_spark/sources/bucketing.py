"""Bucketed tables — shuffle-free co-located joins and aggregations.

At 100 TB the single biggest avoidable cost is re-shuffling a fact table
for every join on its key. Bucketing pays the shuffle ONCE at write time:
``bucketBy(n, key)`` hash-partitions files on disk, and any later
equi-join or group-by on that key between tables with the same bucket
count reads co-located buckets with NO Exchange in the plan (pinned by
tests/test_bucketing.py).

This is the Spark-native analog of the co-located layout an Iceberg
deployment gets from a bucket partition transform (``bucket(n, key)``) —
same hash-distribution idea, expressed through the session catalog since
the test environment has no Iceberg runtime jar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join_ready", "repartition_for_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "errorifexists",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) managed table.

    ``sort_cols`` additionally sorts within each bucket file — joins on the
    bucket+sort key can then merge without sorting either side, and range
    predicates on the sort key skip row groups via parquet min/max.

    Sizing rule: pick ``num_buckets`` so one bucket of the LARGER table is
    a few hundred MB (fits an executor's working memory with headroom);
    both join sides must use the same ``num_buckets`` for co-location.
    """
    writer = df.write.mode(mode).format(fmt).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str) -> bool:
    """True when two saved tables share bucket count and key arity — the
    co-location precondition for a shuffle-free equi-join between them
    (the bucket column NAMES may differ; hash distribution only depends on
    count and arity, e.g. lineitem.l_orderkey ⋈ orders.o_orderkey)."""

    def spec(table: str) -> tuple[int, int] | None:
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
        info = {r["col_name"]: r["data_type"] for r in rows}
        if "Num Buckets" not in info:
            return None
        cols = info.get("Bucket Columns", "").strip("[]").replace("`", "")
        arity = len([c for c in cols.split(",") if c.strip()])
        return int(info["Num Buckets"]), arity

    a, b = spec(left), spec(right)
    return a is not None and a == b


def repartition_for_join(
    left: DataFrame, right: DataFrame, on: list[str], num_partitions: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """One-off co-partitioning for an ad-hoc repeated join (no saved table):
    hash-repartition both sides identically so iterative callers (e.g. a
    multi-pass algorithm joining the same pair) shuffle once, then reuse
    the partitioning via persisted intermediates."""
    if num_partitions:
        return (
            left.repartition(num_partitions, *on),
            right.repartition(num_partitions, *on),
        )
    return left.repartition(*on), right.repartition(*on)
