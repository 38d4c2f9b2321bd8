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
# Round-15 ordering (registry: 247 entries, ALL oracle-backed;
# tt35_sql_partitioned_create — partitioned CREATE/INSERT/partition-
# pruned DELETE in SQL text — was added after the front was sized and
# yields after it, never-driver-checked until round 16's tier 1). Tier 1:
# the four never-driver-checked entries — tt32 (CoW selective DML) and
# b24 (Trino ANSI row limiting), both added after round 14's front was
# sized, plus this round's new tt33 (SQL-text CTAS USING iceberg — the
# round's headline surface fix) and tt34 (DML with top-level OR
# predicates — the round's headline correctness fix: unsound AND-split
# prune extraction disabled under OR). Tier 2: changed-code re-verifies
# — tt10/tt30/tt31 all sit directly on the rewritten CREATE arm, the
# prune-filter extraction, and the rebuilt SQL-scanner keyword logic.
# Tier 3: the first 43 of the 46-entry r10 cohort (the oldest in the
# r01–r14 latest-check union); tiers sum to exactly the ~50 driver
# budget (4+3+43). The cohort's last three (tt16/tx15/w10, positions
# 51–53) stay just past the front and lead round 16's tier 3.
_FRONT = [
    # --- tier 1: never driver-checked (tt32/b24 from round 14; tt33/
    # tt34 new this round) ---
    "tt32_cow_selective_dml",
    "b24_fetch_first_offset",
    "tt33_sql_ctas",
    "tt34_dml_or_predicates",
    # --- tier 2: the FULL 46-entry r10 cohort (oldest in the r01–r14
    # union) — 4 + 46 = exactly the ~50 budget, so the union staleness
    # floor moves r10 → r11 with zero never-checked entries (round-14
    # directive #2) ---
    "a11_unload_roundtrip",
    "aj02_asof_forward_tolerance",
    "b01_projection",
    "b02_filter_comparisons",
    "b03_empty_result",
    "b04_sort_multi",
    "b05_count_star",
    "b06_sum",
    "b07_avg_cast",
    "b08_min_max",
    "b09_groupby_agg_sort",
    "b10_scalar_literals",
    "b11_concat",
    "b12_string_escaping",
    "b13_case_arithmetic",
    "b14_cast_matrix",
    "b15_null_handling",
    "b16_in_between_like",
    "b17_distinct",
    "b18_limit_topk",
    "b19_json_extraction",
    "b20_lateral_explode",
    "b21_variant_extraction",
    "b22_group_by_all",
    "b23_qualify",
    "cu10_domain_curation",
    "dd13_crossmodal_dedup",
    "ev13_level_shifts",
    "ev14_incremental_rollup",
    "io01_format_roundtrip",
    "j01_inner_join",
    "j02_multi_join",
    "j03_left_join",
    "mm05_frame_sampling",
    "mm06_image_resize",
    "mm07_audio_frame_features",
    "sp07_kfold",
    "sp08_fixed_per_group",
    "sp13_mix_manifest",
    "ss08_range_search",
    "st06_stream_snapshot_ingest",
    "st08_stream_cdc_upsert",
    "st09_stream_enrich",
    "tt16_catalog_version_travel",
    "tx15_bigram_fluency",
    "w10_value_navigation",
    # --- positions 51–53: changed-code re-verifies for any budget
    # beyond 50 (all three were r14-green AND are green in this round's
    # builder 246/246 sweep; the OR-guard/CREATE-arm changes they sit on
    # are driver-covered by tt33/tt34 above) ---
    "tt10_sql_merge",
    "tt30_sql_create_table_lifecycle",
    "tt31_sql_merge_merge_on_read",
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
