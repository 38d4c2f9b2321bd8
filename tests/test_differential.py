"""Differential fuzzing in the suite: a deterministic slice of
tools/fuzz_differential.py's grammar runs on every pytest invocation —
generated filter/join/group-by/expression SQL executed on BOTH Spark and
DuckDB and compared as canonical multisets. Wider sweeps (hundreds of queries per
fresh seed) run via the tool directly; 7,800 generated queries across
sf0.01 and sf0.001 agreed at round 5. Round 6 extended the grammar twice
(outer joins with null-extended rows, set operations, HAVING over
aggregates, QUALIFY through the client rewrite; then ROLLUP/CUBE/
GROUPING SETS, correlated scalar subqueries, COUNT DISTINCT): ~13,000
generated queries ran in-round, surfacing ONE real dialect divergence
(empty-input CUBE, pinned below and excluded by construction), after
which 7,700 queries on the final grammar across nine fresh seeds at
both SFs agreed 100%. QUALIFY shapes route through rewrite_qualify on
the Spark side, same as the tool."""

from __future__ import annotations

import os
import random

import duckdb
import pytest

from tools.canonical import canon_rows
from tools.fuzz_differential import SCHEMA, _sample_pools, gen_query
from trino_iceberg_spark.timetravel_sql import rewrite_qualify


@pytest.fixture(scope="module")
def duck_and_views(spark, sf_dir):
    con = duckdb.connect()
    for t in SCHEMA:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        spark.read.parquet(path).createOrReplaceTempView(t)
    return con, _sample_pools(con)


def test_known_divergence_empty_cube(spark, duck_and_views):
    """Round-6 fuzz discovery (seed 424311 #209), pinned as a KNOWN
    dialect divergence: over an EMPTY input relation, the SQL standard
    (and DuckDB/Postgres) emit one grand-total row for the ``()``
    grouping set of CUBE/ROLLUP/GROUPING SETS, but Spark emits zero
    rows. Both engines agree on the plain global aggregate (one row,
    COUNT=0). The fuzz grammar excludes the case by never generating a
    relation-emptying WHERE for grouping-sets shapes; this test fails
    loudly if either engine changes behavior (then the exclusion should
    be re-examined)."""
    con, _pools = duck_and_views
    sql = (
        "SELECT x, CAST(GROUPING(x) AS INT) AS g, COUNT(*) AS c "
        "FROM (SELECT 1 AS x WHERE FALSE) GROUP BY CUBE(x)"
    )
    assert spark.sql(sql).count() == 0  # Spark: no rows at all
    assert len(con.sql(sql).fetchall()) == 1  # DuckDB: the grand-total row
    # and the divergence is CUBE-specific — plain global aggregates agree
    agg = "SELECT COUNT(*) AS c FROM (SELECT 1 AS x WHERE FALSE)"
    assert spark.sql(agg).collect()[0]["c"] == 0
    assert con.sql(agg).fetchall() == [(0,)]


@pytest.mark.parametrize("seed", [0, 1])
def test_generated_queries_agree(spark, duck_and_views, seed):
    con, pools = duck_and_views
    rng = random.Random(seed)
    bad = []
    for i in range(20):
        sql = gen_query(rng, pools)
        sdf = spark.sql(rewrite_qualify(sql) if "QUALIFY" in sql else sql)
        s = canon_rows([c.lower() for c in sdf.columns], [tuple(r) for r in sdf.collect()])
        rel = con.sql(sql)
        d = canon_rows([c.lower() for c in rel.columns], rel.fetchall())
        if s != d:
            bad.append(sql)
    assert not bad, bad


def test_dml_rewriter_differential_slice(spark, tmp_path):
    """Deterministic slice of tools/fuzz_dml.py: generated INSERT/UPDATE/
    DELETE/MERGE sequences applied through client.execute() against a
    snapshot table AND a DuckDB twin, comparing per-statement affected
    counts and final table states. The wider sweeps run via the tool
    (1,000 sequences per round); this slice replays the seeds that
    originally caught the non-quote-aware MERGE source scan and the
    three-valued-logic DELETE bug, so both stay fixed."""
    from tools.fuzz_dml import run_sequence

    for seq_no in range(6):  # seed 1 seqs 0-5 include both historic bugs
        problems = run_sequence(spark, seq_no, 1, str(tmp_path))
        assert not problems, "\n".join(problems)


def test_dml_rewriter_differential_slice_merge_on_read(spark, tmp_path):
    """Same differential harness with the Iceberg table property
    ``write.delete.mode=merge-on-read``: every generated DELETE commits
    position-delete files instead of a copy-on-write rewrite, while the
    DuckDB twin is untouched — the two delete modes must be
    observationally identical, including CoW UPDATE/MERGE landing on a
    table with outstanding delete files."""
    from tools.fuzz_dml import run_sequence

    for seq_no in range(4):
        problems = run_sequence(
            spark, seq_no, 2, str(tmp_path), delete_mode="merge-on-read"
        )
        assert not problems, "\n".join(problems)


def test_timetravel_rewriter_differential_slice(spark, tmp_path):
    """Deterministic slice of tools/fuzz_timetravel.py: generated
    FOR TIMESTAMP/VERSION AS OF queries (boundary timestamps, branch/tag
    refs, metadata relations, travel+current self-joins, two travel
    clauses per statement, string-literal decoys) run through the
    client's rewrite_time_travel path AND replayed against temp views
    built from the direct snapshot API (read_as_of/read_version/
    read_ref), comparing row sets and refusal behavior. The wider sweep
    runs via the tool (50 cases x ~10 queries per campaign; round-8 ran
    two campaigns, seeds 8 and 999 — 1,000 generated queries, 0
    divergences)."""
    from tools.fuzz_timetravel import run_case

    for case_no in range(3):
        problems = run_case(spark, case_no, 0, str(tmp_path))
        assert not problems, "\n".join(problems)


def test_dml_travel_integration_slice(spark, tmp_path):
    """Deterministic slice of tools/fuzz_dml_travel.py: DML sequences
    applied through client.execute build snapshot histories whose every
    intermediate state must be reconstructable by BOTH travel
    addressings (FOR VERSION AS OF and inclusive FOR TIMESTAMP AS OF),
    and a pre-history timestamp must refuse. The wider campaign runs
    via the tool (40 sequences/round)."""
    from tools.fuzz_dml_travel import run_sequence

    for seq_no in range(3):
        problems = run_sequence(spark, seq_no, 0, str(tmp_path))
        assert not problems, "\n".join(problems)


def test_ddl_surface_differential_slice(spark, tmp_path):
    """Deterministic slice of tools/fuzz_ddl.py (round-13): generated
    schema-evolution / branch-tag / ANALYZE / SET PROPERTIES statements
    with hostile spelling (mixed keyword case, backquotes, whitespace,
    ARRAY vs bracket column lists, SET DATA TYPE vs TYPE, IF [NOT]
    EXISTS) replayed against a pure-Python model of the table. The
    regex-dispatched SQL arms are exactly where a spelling variant can
    fall through to Catalyst and die opaquely — accept/refuse parity
    plus final schema/ref/stats/property parity is the contract."""
    from tools.fuzz_ddl import run_sequence

    for seq_no in range(8):
        problems = run_sequence(spark, seq_no, 1, str(tmp_path))
        assert not problems, "\n".join(problems)
