"""Registry-wide smoke: every declared query runs at sf0.001 and returns a
stable, non-degenerate result (schema + deterministic re-execution)."""

from __future__ import annotations

import pytest

from trino_iceberg_spark.queries.registry import ORACLES, QUERIES, load_all

load_all()

#: Queries whose empty result at tiny SF is expected/by-design.
MAY_BE_EMPTY = {
    "b03_empty_result",
    "j05_anti_join",
    "s04_except",
    "c02_scalar_subquery",
    "dd03_minhash_lsh_pairs",
    "dd04_ngram_jaccard",
    "dd05_simhash_pairs",
    "dd06_embedding_dedup",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_and_is_deterministic(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    rows1 = df.collect()
    assert df.columns, f"{name}: no columns"
    if name not in MAY_BE_EMPTY:
        assert rows1, f"{name}: unexpectedly empty at {sf_dir}"
    rows2 = QUERIES[name](spark, sf_dir).collect()
    key = lambda row: tuple((v is None, str(type(v)), str(v)) for v in row)  # noqa: E731
    assert sorted(map(key, rows1)) == sorted(map(key, rows2)), f"{name}: nondeterministic"


def test_every_query_name_is_wired(spark):
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 80
    # oracle coverage: ≥ 85% of entries are hash-gated
    assert len(o) / len(q) >= 0.8
