"""Physical-plan assertions — the 100 TB design gates.

Each test pins a plan property that matters at scale: pushdown reaching the
parquet scan, column pruning, broadcast joins on dims, map-side partial
aggregation, top-K short-circuits, rank-limit pushdown. A regression here
means a query silently became a full-scan/shuffle — correctness tests
would never notice."""

from __future__ import annotations

import pytest

from trino_iceberg_spark.queries.registry import QUERIES, load_all

load_all()


import re


def plan_of(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def node_count(plan: str, node: str) -> int:
    """Count plan nodes by their '(N) NodeName' detail headers (the tree
    section repeats names, so a raw substring count double-counts)."""
    return len(re.findall(rf"\(\d+\) {node}\b", plan))


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "b02_filter_comparisons")
    assert "PushedFilters:" in plan
    assert "GreaterThanOrEqual(l_quantity,30" in plan.replace(".0", "")
    assert "EqualTo(l_returnflag,R)" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "b01_projection")
    # ReadSchema must list only the 3 projected columns
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "c_custkey" in read_schema and "c_name" in read_schema and "c_mktsegment" in read_schema
    assert "c_acctbal" not in read_schema and "c_nationkey" not in read_schema


def test_dim_joins_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "tpch_q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan


def test_q1_partial_aggregation(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "tpch_q1_pricing_summary")
    assert node_count(plan, "HashAggregate") >= 2  # partial + final


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "b18_limit_topk")
    assert "TakeOrderedAndProject" in plan


def test_window_topk_rank_limit_pushdown(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "w01_topk_per_group")
    assert "WindowGroupLimit" in plan


def test_q6_no_shuffle(spark, sf_dir):
    """Pure filter+agg: the only exchange is the single-row final agg."""
    plan = plan_of(spark, sf_dir, "tpch_q6_forecast_revenue")
    assert node_count(plan, "Exchange") <= 1


def test_semi_join_planned(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "j04_semi_join")
    assert "LeftSemi" in plan


def test_q7_no_sort_merge_join(spark, sf_dir):
    """Snowflake joins must resolve to broadcast/hash strategies at this
    SF; a SortMergeJoin here would mean a dim lost its broadcast hint."""
    plan = plan_of(spark, sf_dir, "tpch_q7_volume_shipping")
    assert node_count(plan, "SortMergeJoin") == 0
    assert node_count(plan, "BroadcastHashJoin") >= 3


def test_q8_eight_table_join_broadcasts(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "tpch_q8_market_share")
    assert node_count(plan, "BroadcastHashJoin") >= 5
    assert node_count(plan, "CartesianProduct") == 0


def test_q13_left_join_preserved(spark, sf_dir):
    """The priority filter must ride the join condition (LeftOuter), not a
    post-join WHERE — a WHERE would silently turn the join inner."""
    plan = plan_of(spark, sf_dir, "tpch_q13_customer_distribution")
    assert "LeftOuter" in plan


def test_q17_no_window_over_fact(spark, sf_dir):
    """The per-part average must be a grouped aggregate joined back, not a
    window over the whole fact table (a window would sort every partition
    of lineitem)."""
    plan = plan_of(spark, sf_dir, "tpch_q17_small_quantity_revenue")
    assert node_count(plan, "Window") == 0


def test_q22_anti_join_planned(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "tpch_q22_global_sales_opportunity")
    assert "LeftAnti" in plan


def test_q2_broadcasts_dims_and_windows_small_aggregate(spark, sf_dir):
    """q2's correlated MIN must be a window over the offer aggregate —
    all dims broadcast, no second lineitem scan, no self-join of the fact."""
    plan = plan_of(spark, sf_dir, "tpch_q2_min_cost_supplier")
    assert node_count(plan, "BroadcastHashJoin") >= 3
    assert "Window" in plan
    assert node_count(plan, "Scan parquet") <= 6  # each table scanned once


def test_q20_semi_joins_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "tpch_q20_part_promotion_suppliers")
    assert "LeftSemi" in plan
    assert "PushedFilters" in plan and "StringStartsWith(p_name,red)" in plan


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """The benchmark gram set must broadcast into the corpus explode —
    a shuffled join here would move the whole exploded corpus."""
    plan = plan_of(spark, sf_dir, "cu03_decontaminate")
    assert "BroadcastHashJoin LeftSemi" in plan or (
        "BroadcastHashJoin" in plan and "LeftSemi" in plan
    )


def test_pii_scrub_is_pure_projection(spark, sf_dir):
    """No hash exchange anywhere: the scrub must scale with the scan (the
    only exchange allowed is the final global sort's range partition)."""
    plan = plan_of(spark, sf_dir, "tx11_pii_scrub")
    assert plan.count("Arguments: hashpartitioning") == 0


def test_centroid_single_shuffle(spark, sf_dir):
    """posexplode -> map-side partial sums -> exactly one hash exchange
    keyed by (group, dim); everything else is the output sort."""
    plan = plan_of(spark, sf_dir, "ss06_embedding_centroids")
    assert plan.count("Arguments: hashpartitioning") == 1
    assert node_count(plan, "HashAggregate") >= 2  # partial + final


def test_sp04_packing_no_global_data_window(spark, sf_dir):
    """The packing cumsum must never window the corpus on one partition:
    the data-sized window is partitioned by the key-prefix bucket, and the
    bucket-offset table joins back via broadcast. (The one unpartitioned
    window in the plan is over the 16^2-row bucket totals — bounded.)"""
    plan = plan_of(spark, sf_dir, "sp04_sequence_packing")
    assert node_count(plan, "Window") == 2
    assert "BroadcastHashJoin" in plan
    # the corpus-side window is keyed by the derived bucket column
    assert "_bucket" in plan


def test_evolved_snapshot_read_keeps_pushdown(spark, tmp_path):
    """Schema evolution must not cost the scan its pushdown: a filter on a
    RENAMED column has to reach the parquet reader under the file's
    on-disk name, and the read schema must stay pruned (the id-resolution
    projection is alias+cast only; SimplifyCasts elides same-type casts)."""
    from pyspark.sql import functions as F

    from trino_iceberg_spark.catalog.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "evplan"))
    t.append(spark.range(100).select(F.col("id").alias("old"), (F.col("id") * 2).alias("x")))
    t.rename_column("old", "k")
    t.add_column("z", "int")
    plan = (
        t.read()
        .filter(F.col("k") == 5)
        .select("k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EqualTo(old,5)" in plan  # pushed down under the on-disk name
    assert "ReadSchema: struct<old:bigint>" in plan  # pruned to the one column


def test_dynamic_partition_pruning_on_hive_layout(spark, sf_dir, tmp_path):
    """A hive-partitioned fact joined to a selectively-filtered dim must
    plan a dynamic-pruning subquery on the partition column — at 100 TB
    this is the difference between scanning 3 partitions and scanning all
    of them when the partition filter only becomes known at runtime."""
    import datetime as dt

    from pyspark.sql import functions as F

    from trino_iceberg_spark.sources.testdata import load_table

    path = str(tmp_path / "events_by_day")
    (
        load_table(spark, sf_dir, "events")
        .withColumn("day", F.to_date("ts"))
        .write.partitionBy("day")
        .parquet(path)
    )
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(dt.date(2024, 1, d), "keep" if d <= 3 else "drop") for d in range(1, 11)],
        "day date, tag string",
    )
    joined = fact.join(dim.where(F.col("tag") == "keep"), "day").groupBy("day").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_aqe_splits_skewed_join_partitions(spark):
    """Runtime skew handling: a sort-merge join with one hot key must come
    out of AQE with the skewed partition SPLIT (skew=true reader) rather
    than one straggler task — the mechanism that saves unsalted joins at
    100 TB when skew is discovered only at runtime. Confs are set on an
    isolated newSession clone so the shared fixture is untouched."""
    from pyspark.sql import functions as F

    s = spark.newSession()
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }.items():
        s.conf.set(k, v)
    left = (
        s.range(0, 400000)
        .withColumn(
            "k", F.when(F.col("id") % 4 < 3, F.lit(7)).otherwise(F.col("id") % 8)
        )
        .withColumn("pay", F.concat(F.lit("x" * 100), F.col("id").cast("string")))
    )
    right = s.range(0, 8).withColumn("k", F.col("id") % 8).withColumn(
        "rv", F.col("id") * 2
    )
    j = left.join(right, "k")
    assert len(j.collect()) == 400000
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan  # the hot partition was split at runtime


def test_bloom_probe_is_map_side(spark, sf_dir):
    """ev15's probe must never shuffle or sort-merge-join the fact side:
    the bitmap arrives via BroadcastNestedLoopJoin (1 row) and the
    exact-hit dim via BroadcastHashJoin — if either degrades to a
    SortMergeJoin the fact table gains a keyed shuffle and the
    no-fact-shuffle contract is gone. The remaining exchanges all belong
    to the small REFERENCE path (distincts, word groupBy, 1-row agg) and
    the final orderBy."""
    plan = plan_of(spark, sf_dir, "ev15_bloom_prefilter")
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row bitmap broadcast
    assert "BroadcastHashJoin" in plan  # the exact-hit dim join
    assert node_count(plan, "SortMergeJoin") == 0
    assert node_count(plan, "CartesianProduct") == 0


def test_substring_dedup_two_shuffle_shape(spark, sf_dir):
    """dd14 shuffles the WINDOW table (by whash for the count + the
    verdict join) and the per-doc span/stat stages (by doc id) — never a
    cartesian/nested-loop pairing of documents."""
    plan = plan_of(spark, sf_dir, "dd14_substring_dedup")
    assert node_count(plan, "CartesianProduct") == 0
    assert node_count(plan, "BroadcastNestedLoopJoin") == 0


def test_ivf_index_routing_no_extra_shuffle(spark, sf_dir):
    """ss09's routing is map-side GEMM (ArrowEvalPython/mapInPandas), so
    the only exchanges are the snapshot-table writes' — no join of the
    vector table against anything."""
    plan = plan_of(spark, sf_dir, "ss09_incremental_ivf_index")
    assert node_count(plan, "CartesianProduct") == 0
    assert node_count(plan, "SortMergeJoin") == 0


def test_mmr_pool_attach_broadcasts(spark, sf_dir):
    """ss12's pool-vector attach must be a broadcast hash join (the big
    embedding table streams map-side; the bounded pool table ships), and
    the only nested-loop join is cosine_topk's documented query-set
    broadcast — nothing degenerates to a shuffle of the corpus."""
    plan = plan_of(spark, sf_dir, "ss12_mmr_rerank")
    assert node_count(plan, "BroadcastHashJoin") >= 1
    assert node_count(plan, "SortMergeJoin") == 0
    assert node_count(plan, "CartesianProduct") == 0


def test_mmr_lsh_variant_has_no_cross_product(spark, sf_dir):
    """ss13 (LSH pool) must plan candidate generation as an equi-join on
    bucket id — zero BroadcastNestedLoopJoin/CartesianProduct anywhere,
    the property that makes it the two-large-sides scale path."""
    plan = plan_of(spark, sf_dir, "ss13_mmr_rerank_lsh")
    assert node_count(plan, "BroadcastNestedLoopJoin") == 0
    assert node_count(plan, "CartesianProduct") == 0


def test_curriculum_order_two_phase_cumsum_windows(spark, sf_dir):
    """sp12's global_step must come from the two-phase cumsum: the
    corpus-sized window is PARTITIONED by _bucket (parallel), the only
    unpartitioned window runs over the bounded bucket-totals table and
    is fed by a BroadcastExchange back to the data — never a global sort
    of the corpus into one partition."""
    plan = plan_of(spark, sf_dir, "sp12_curriculum_order")
    assert node_count(plan, "Window") == 2
    # intra-bucket pass: spec carries the _bucket partition column
    assert re.search(r"windowspecdefinition\(_bucket#\d+, curriculum_key", plan)
    # offsets pass: ordered by _bucket only (no partition col), and its
    # result rejoins the data via a broadcast, proving it is tiny
    assert re.search(r"windowspecdefinition\(_bucket#\d+ ASC", plan)
    assert node_count(plan, "BroadcastExchange") >= 1


def test_ngram_novelty_partial_aggregation(spark, sf_dir):
    """tx17's gram->min(doc_id) reduction must partial-aggregate before
    the exchange (viral grams combine map-side) and never plan a
    cartesian/nested-loop join for the gram join-back."""
    plan = plan_of(spark, sf_dir, "tx17_ngram_novelty")
    assert node_count(plan, "HashAggregate") >= 2  # partial + final
    assert node_count(plan, "CartesianProduct") == 0
    assert node_count(plan, "BroadcastNestedLoopJoin") == 0


def test_mor_pruned_read_isolates_delete_machinery(spark, tmp_path):
    """Round-11 delete-file→data-file pruning: after a CONTAINED
    position delete on a range-clustered table, the read plan must be a
    UNION of a clean scan (untouched files — no (file, pos) identity
    projection, no anti-join) with one small dirty subtree carrying the
    single broadcast anti-join. Before the fix every file paid the MOR
    machinery (one monolithic scan, no union) — the measured ~3× read
    tax on untouched data."""
    from pyspark.sql import functions as F

    from trino_iceberg_spark.catalog.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "morplan"))
    t.append(
        spark.range(4000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v")
        ),
        cluster_by=["k"],
        cluster_partitions=8,
    )
    t.delete_where(F.col("k") < 100, mode="merge-on-read")
    snap = t.current_snapshot()
    assert len(snap.files) == 8
    assert len(t._mor_touched_files(snap)) == 1  # only the low-band file
    df = t.read()
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert node_count(plan, "Union") == 1
    assert node_count(plan, "BroadcastHashJoin") == 1  # dirty subtree only
    assert df.count() == 3900
