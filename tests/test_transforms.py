"""Iceberg-style partition transform tests: distribution, floor semantics,
and planning-time pruning through a transform-partitioned write."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from trino_iceberg_spark.functions.transforms import (
    bucket_transform,
    day_transform,
    hour_transform,
    month_transform,
    truncate_transform,
    write_transform_partitioned,
    year_transform,
)
from trino_iceberg_spark.sources.testdata import load_table


def test_bucket_transform_stable_and_bounded(spark):
    df = spark.range(1000).select(
        "id", bucket_transform("id", 16).alias("b1"), bucket_transform("id", 16).alias("b2")
    )
    rows = df.collect()
    assert all(r["b1"] == r["b2"] for r in rows)  # deterministic
    assert all(0 <= r["b1"] < 16 for r in rows)  # bounded
    assert len({r["b1"] for r in rows}) == 16  # spread


def test_truncate_transform_floors_negatives(spark):
    df = spark.createDataFrame([(-7,), (-10,), (7,), (13,)], ["v"]).select(
        "v", truncate_transform("v", 10, kind="int").alias("t")
    )
    got = {r["v"]: r["t"] for r in df.collect()}
    assert got == {-7: -10, -10: -10, 7: 0, 13: 10}


def test_truncate_transform_strings(spark):
    df = spark.createDataFrame([("abcdef",), ("ab",)], ["s"]).select(
        truncate_transform("s", 3).alias("t")
    )
    assert {r["t"] for r in df.collect()} == {"abc", "ab"}


def test_calendar_transforms(spark):
    df = spark.sql(
        "SELECT TIMESTAMP '2024-03-05 17:30:00' AS ts"
    ).select(
        year_transform("ts").alias("y"),
        month_transform("ts").alias("m"),
        day_transform("ts").alias("d"),
        hour_transform("ts").alias("h"),
    )
    r = df.first()
    assert r["y"] == 2024 and r["m"] == "2024-03"
    assert str(r["d"]) == "2024-03-05" and r["h"] == "2024-03-05-17"


def test_transform_partitioned_write_prunes(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "ev_transformed")
    write_transform_partitioned(
        ev,
        out,
        {"day": day_transform("ts"), "user_bkt": bucket_transform("user_id", 4)},
    )
    back = spark.read.parquet(out).filter(
        (F.col("day") == "2024-01-05") & (F.col("user_bkt") == 2)
    )
    plan = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "day" in pf and "user_bkt" in pf
    expected = (
        ev.withColumn("user_bkt", bucket_transform("user_id", 4))
        .filter((F.col("ts").cast("date") == "2024-01-05") & (F.col("user_bkt") == 2))
        .count()
    )
    assert back.count() == expected
