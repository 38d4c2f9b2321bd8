"""Bucketed-table tests: the write-once-shuffle-never join contract."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from trino_iceberg_spark.sources.bucketing import (
    bucketed_join_ready,
    repartition_for_join,
    write_bucketed,
)
from trino_iceberg_spark.sources.testdata import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(li, "bkt_lineitem", ["l_orderkey"], 8, mode="overwrite")
    write_bucketed(o, "bkt_orders", ["o_orderkey"], 8, mode="overwrite")
    yield "bkt_lineitem", "bkt_orders"
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = spark.table(left).join(
        spark.table(right), F.col("l_orderkey") == F.col("o_orderkey")
    )
    plan = _plan(joined)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = _plan(agg)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    bucketed_count = (
        spark.table(left)
        .join(spark.table(right), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    plain_count = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert bucketed_count == plain_count


def test_bucketed_join_ready_detects_spec(spark, bucketed_tables):
    left, right = bucketed_tables
    assert bucketed_join_ready(spark, left, right)


def test_repartition_for_join_aligns_partitioning(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    a, b = repartition_for_join(li, o, ["l_orderkey"], num_partitions=8)
    assert a.rdd.getNumPartitions() == 8
    assert b.rdd.getNumPartitions() == 8
