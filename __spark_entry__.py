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
# Round-12 ordering (registry: 236 entries, ALL oracle-backed). Per the
# round-11 VERDICT directive #1, the front is: tt23 FIRST (the one entry
# no driver CORRECTNESS run has ever checked — it yielded after the r11
# front by design), then this round's new entries (3, under the ~4 cap),
# then changed-code re-verifies, then the FULL 42-entry r07 cohort (the
# oldest in the r01–r11 latest-check union: f-family, 13 tpch, ss01/
# ss04, cu03/cu08/cu09, dd07/dd08, w07, ev07, mm08, sp10/sp11, tt07,
# tx09) so the union staleness floor moves r07 → r08 with zero
# never-checked entries.
# Tiers (1+3+4+42 = 50, exactly the ~50 driver budget):
# 1. tt23 (never driver-checked; judge-green twice);
# 2. new this round: tt24_add_files_hive_partitioned — add_data_files
#    over a col=value/ hive lake, partition values from the PATHS
#    recorded as identity-partition manifest values, pruned and
#    re-attached at read — tt25_table_health — the $health metadata
#    relation making equality-delete dirty-set drift observable
#    (recommendation flips to rewrite_delete_files at dirty ≥ 0.25 and
#    clears after the rewrite) — and tt26_partitions_metadata — the
#    $partitions relation: per-partition file/record counts from the
#    manifest's per-file record_count, labels following renames by id;
# 3. changed-code re-verifies: _commit gained writer-side type
#    acceptance (every catalog writer) and add_data_files the
#    fingerprint conflict check — tt17/tt18/tt19 are the MOR-heavy
#    representatives; operators/timeseries.py's spine went
#    bigint-quantity — ev06 rides it;
# 4. the 42-entry r07 cohort.
# Everything else was checked r08–r11 and yields after these.
_FRONT = [
    # --- tier 1: new this round (never driver-checked). The changed-code
    # re-verify slot went to tt29 over a tt10 repeat: tt27 itself IS the
    # rewritten INSERT dispatch, tt29 the new incremental-ANALYZE path,
    # and tt10 (MERGE) re-verified green in this round's builder sweeps;
    # it leads the post-front middle tier for any driver budget > 50. ---
    "tt27_sql_insert_coercions",
    "tt28_stats_staleness",
    "tt29_incremental_analyze",
    # --- tier 3: FULL r08 cohort (oldest in the r01–r12 union, 47
    # entries — checking all of them moves the staleness floor to r09) ---
    "a09_unpivot",
    "a10_grouping_flags",
    "aj01_asof_join",
    "c04_recursive_cte",
    "cu01_curated_documents",
    "cu02_curation_report",
    "cu04_length_band_filter",
    "cu05_contamination_report",
    "cu07_end_to_end_pipeline",
    "dd04_ngram_jaccard",
    "dd12_passage_dedup",
    "dd15_containment_pairs",
    "f09_edit_distance",
    "f10_bitwise_functions",
    "j10_bucketed_join",
    "mm01_media_metadata",
    "mm02_decode_pipeline",
    "mm04_audio_decode",
    "pr01_table_profile",
    "pr02_correlation_matrix",
    "pr03_quality_expectations",
    "pr05_calibration_bins",
    "rag01_retrieval_pipeline",
    "rj01_bucketized_range_join",
    "s05_set_ops_all",
    "sp01_dataset_split",
    "sp12_curriculum_order",
    "ss10_margin_mining",
    "ss11_margin_mining_lsh",
    "st01_windowed_stream",
    "st02_session_stream",
    "st03_sliding_stream",
    "st04_stream_stream_join",
    "st05_stateful_running_totals",
    "tpch_q1_pricing_summary",
    "tt05_schema_evolution",
    "tt06_stats_pruned_scan",
    "tt08_wap_publish",
    "tt09_catalog_transaction",
    "tx01_token_counts",
    "tx02_lang_stats",
    "tx03_quality_features",
    "tx06_bpe_token_estimate",
    "tx07_vocabulary",
    "tx08_bigram_counts",
    "tx10_bm25_ranking",
    "tx17_ngram_novelty",
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
