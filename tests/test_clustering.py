"""Connected-components / near-dedup clustering invariants
(operators/clustering.py) — structural cases a SQL oracle can't probe:
long chains (pointer-jumping), multiple components, singletons, symmetry.
"""

from __future__ import annotations

import pytest

from trino_iceberg_spark.operators.clustering import (
    attach_components,
    connected_components,
    near_dedup_survivors,
)


def _cc_dict(spark, edges):
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    return {r.node: r.component for r in connected_components(df, "id_a", "id_b").collect()}


def test_two_components_and_chain(spark):
    # chain 1-2-3-4 plus pair 10-11; chain exercises multi-round propagation
    got = _cc_dict(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_chain_converges_fast(spark):
    # 200-node path: O(n) rounds without pointer jumping; must finish in 25
    edges = [(i, i + 1) for i in range(200)]
    got = _cc_dict(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 201


def test_edge_direction_irrelevant(spark):
    assert _cc_dict(spark, [(5, 2), (2, 9)]) == {2: 2, 5: 2, 9: 2}


def test_self_loops_ignored(spark):
    got = _cc_dict(spark, [(3, 3), (1, 2)])
    assert got == {1: 1, 2: 1}


def test_attach_components_singletons(spark):
    docs = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "doc_id bigint, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a bigint, id_b bigint")
    got = {r.doc_id: r.component for r in attach_components(docs, pairs, "doc_id").collect()}
    assert got == {1: 1, 2: 1, 3: 3}  # 3 is a singleton cluster of itself


def test_survivors_keep_min_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1, 7)], "doc_id bigint, text string"
    )
    # clusters {1,2,3} and {5,6}; 4 untouched
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "id_a bigint, id_b bigint")
    kept = sorted(
        r.doc_id for r in near_dedup_survivors(docs, pairs, "doc_id").collect()
    )
    assert kept == [1, 4, 5]


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "id_a bigint, id_b bigint")
    with pytest.raises(RuntimeError):
        connected_components(df, "id_a", "id_b", max_iter=0)
