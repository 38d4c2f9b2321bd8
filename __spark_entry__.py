"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real inventory lives in :mod:`trino_iceberg_spark.queries` — every
entry registers a Spark callable and (when SQL-expressible) a DuckDB
oracle; this module is a thin adapter over that registry.

Two adapter concerns live here, both driver-facing:

1. **Order.** The driver's correctness sweep is budget-capped (~50
   entries/round), so ``queries()`` yields the inventory in priority
   order: first this round's fixed/changed entries and the entries no
   prior CORRECTNESS run has checked, then drift re-verifies of the
   oldest green cohort (see ``_FRONT``), then any remaining unchecked
   entries, then families already proved green across the r01–r11
   union. Nothing is dropped — a driver with budget for the full
   registry still checks every entry.

2. **Session tuning.** The driver supplies its own SparkSession; wrap
   every callable to pin the runtime SQL confs correctness and speed
   depend on (UTC timestamps for oracle hash-stability, nanosAsLong for
   events.parquet, AQE + modest shuffle parallelism for sf0.01-sized
   shuffles). All are runtime-settable; a session that already has them
   is untouched.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from trino_iceberg_spark.queries.registry import ORACLES, QUERIES, load_all

_TUNED_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
}

# Entries whose driver-side verdict is most informative this round; see
# module docstring. Names absent from the registry are ignored (safety
# against future renames), and every registered query is always yielded.
#
# Round-14 ordering (registry: 243 entries, ALL oracle-backed; tt32 —
# CoW selective DML — was added after the front was sized and yields
# after it, never-driver-checked until round 15's tier 1). Per the
# round-13 VERDICT directive #2, the front is: tt30 FIRST (the one entry
# no driver CORRECTNESS run has ever checked — it yielded after the r13
# front by design), then this round's new entry tt31 (SQL MERGE under
# write.merge.mode=merge-on-read — the round's headline fix — with
# conditional clauses incl. a CASE AND-condition, read back through the
# committed row delta's delete files), then tt10 (the SQL-MERGE arm is
# this round's most-rewritten code path), then the FULL 47-entry r09
# cohort (the oldest in the r01–r13 latest-check union) so the union
# staleness floor moves r09 → r10 with zero never-checked entries.
# Tiers sum to exactly the ~50 driver budget (1+1+1+47); tt17/tt18 (the
# other MERGE-adjacent MOR representatives, both r13-green and re-run
# green in this round's builder sweeps) sit at positions 51–52 for any
# driver budget beyond 50.
_FRONT = [
    # --- tier 1: never driver-checked ---
    "tt30_sql_create_table_lifecycle",
    "tt31_sql_merge_merge_on_read",
    # --- tier 2: changed-code re-verify (SQL MERGE rework + CoW
    # touched-file rewrite both sit under this statement) ---
    "tt10_sql_merge",
    # --- tier 3: FULL r09 cohort (oldest in the r01–r13 union, 47
    # entries — checking all of them moves the staleness floor to r10) ---
    "cu06_boilerplate_removal",
    "dd03_minhash_lsh_pairs",
    "dd05_simhash_pairs",
    "dd06_embedding_dedup",
    "dd09_fuzzy_linkage",
    "dd10_incremental_dedup",
    "dd11_semantic_dedup",
    "ev08_hypertable_rollup",
    "ev11_interpolated_gap_fill",
    "f11_string_functions2",
    "ir01_retrieval_metrics",
    "mm03_feature_extraction",
    "pr04_drift_psi",
    "sk01_salted_aggregate",
    "sk02_salted_join",
    "sp02_stratified_sample",
    "sp03_global_shuffle",
    "sp04_sequence_packing",
    "sp05_epoch_mix",
    "sp06_temperature_weights",
    "ss02_lsh_topk",
    "ss03_ivf_topk",
    "ss05_quantized_topk",
    "ss06_embedding_centroids",
    "ss07_hard_negatives",
    "ss12_mmr_rerank",
    "ss13_mmr_rerank_lsh",
    "ss14_pq_adc_topk",
    "st07_stream_dedup",
    "tpch_q15_top_supplier",
    "tt01_timestamp_as_of",
    "tt02_version_as_of",
    "tt04_sql_text_time_travel",
    "tt11_partition_evolution",
    "tt12_sorted_compaction",
    "tt13_sql_maintenance",
    "tt14_rollback",
    "tt15_zorder_rewrite",
    "tx04_language_id",
    "tx05_fingerprints",
    "tx11_pii_scrub",
    "tx12_repetition_stats",
    "tx13_rarity_scores",
    "tx14_sliding_chunks",
    "w03_lag_lead",
    "w06_sessionize",
    "w09_time_range_frame",
    # --- positions 51+: MERGE-adjacent MOR re-verifies for any budget
    # beyond 50 ---
    "tt17_merge_on_read_delete",
    "tt18_equality_delete_cdc",
]

# Entries a prior CORRECTNESS run already recorded green (r01–r11 union:
# 233/234 distinct entries checked, all green at latest check; tt23 is
# tier 1 above) — yielded last. Prefix-matched on the name's first
# underscore token.
_PROVEN = frozenset(
    [f"b{i:02d}" for i in range(1, 22)]  # b01–b21
    + [f"j{i:02d}" for i in range(1, 11)]
    + [f"w{i:02d}" for i in range(1, 10)]
    + [f"a{i:02d}" for i in range(1, 11)]
    + [f"s{i:02d}" for i in range(1, 6)]
    + [f"c{i:02d}" for i in range(1, 5)]
    + ["tpch"]  # all 22 green by r03 (q15's plan change is in _FRONT)
    + [f"f{i:02d}" for i in range(1, 11)]
    + [f"ev{i:02d}" for i in range(1, 8)]
    + [f"st{i:02d}" for i in range(1, 7)]
    + [f"tt{i:02d}" for i in range(5, 10)]
    + [f"cu{i:02d}" for i in range(1, 6)]
    + [f"pr{i:02d}" for i in range(1, 4)]
    + ["aj01", "rj01", "sp01", "mm01", "mm02", "mm04"]
    + ["dd01", "dd02", "dd04", "dd07", "dd08", "dd12", "ss01", "ss04"]
    + ["tx01", "tx02", "tx03", "tx06", "tx07", "tx08"]
    + ["tx09", "tx10", "tx11", "tx12", "tx13", "tx14"]
)


def _is_proven(name: str) -> bool:
    return name.split("_", 1)[0] in _PROVEN


def _tuned(fn: Callable[[SparkSession, str], DataFrame]):
    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        for key, value in _TUNED_CONFS.items():
            try:
                spark.conf.set(key, value)
            except Exception:  # noqa: BLE001 — a locked-down conf never blocks a query
                pass
        return fn(spark, sf_dir)

    return wrapped


def _priority_order(names: list[str]) -> list[str]:
    front = [n for n in _FRONT if n in names]
    rest = [n for n in names if n not in front]
    middle = [n for n in rest if not _is_proven(n)]
    proven = [n for n in rest if _is_proven(n)]
    return front + middle + proven


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 pricing summary."""
    load_all()
    return _tuned(QUERIES["tpch_q1_pricing_summary"])(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    load_all()
    return {name: _tuned(QUERIES[name]) for name in _priority_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for non-SQL-
    expressible ops — LSH/signature/streaming internals — which the driver
    records as rows-only checks)."""
    load_all()
    return {
        name: ORACLES[name]
        for name in _priority_order(list(QUERIES))
        if name in ORACLES
    }
