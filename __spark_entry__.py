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
    # --- tier 1: the one never-driver-checked entry ---
    "tt23_null_key_equality_delete",
    # --- tier 2: new this round ---
    "tt24_add_files_hive_partitioned",
    "tt25_table_health",
    "tt26_partitions_metadata",
    # --- tier 3: changed-code re-verifies ---
    "tt17_merge_on_read_delete",
    "tt18_equality_delete_cdc",
    "tt19_eqdelete_field_id_evolution",
    "ev06_hourly_gap_fill",
    # --- tier 4: r07 cohort (oldest in the union) ---
    "cu03_decontaminate",
    "cu08_dsir_selection",
    "cu09_token_budget_selection",
    "dd07_duplicate_clusters",
    "dd08_near_dedup_survivors",
    "ev07_value_outliers",
    "f01_string_functions",
    "f02_date_functions",
    "f03_math_functions",
    "f04_conditional_functions",
    "f05_hash_functions",
    "f06_regex_functions",
    "f07_array_functions",
    "f08_map_functions",
    "mm08_multimodal_to_shards",
    "sp10_corpus_to_shards",
    "sp11_greedy_packing",
    "ss01_cosine_topk",
    "ss04_numpy_topk",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_nation_revenue",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q12_priority_shipping",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q16_part_supplier_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_discounted_revenue",
    "tpch_q20_part_promotion_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_global_sales_opportunity",
    "tt07_metadata_tables",
    "tx09_tfidf_top_terms",
    "w07_moving_average",
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
