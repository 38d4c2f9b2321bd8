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
   entries, then families already proved green across the r01–r04
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
# Round-5 ordering (registry: 209 entries — ev15_bloom_prefilter,
# dd14_substring_dedup, ss09_incremental_ivf_index, and
# sp09_training_shards are new — ALL 209
# oracle-backed; ev09 gained an
# exact-distinct oracle with an inline HLL error assert), four tiers
# sized to the driver's ~50-entry budget:
# 1. the two round-4 hash-RED rows, now fixed (value_sum cast to DOUBLE
#    at the output boundary, ev08 convention) plus ev09, upgraded from
#    rows-only to oracle-backed;
# 2. the 13 entries no CORRECTNESS run has ever checked (all added in
#    round 4; all passed the local DuckDB gate twice — r4 and this
#    round);
# 3. changed-code re-verifies: the QUALIFY rewrite gained set-operation
#    branch scoping (b23), sample_rollup's join went null-safe (ev12),
#    and every snapshot-table/stream entry moved to PID-namespaced
#    scratch dirs (representatives: st06/st08/tt16; the change is
#    mechanical and pytest-covered for the rest);
# 4. drift re-verifies of the oldest green cohort — b*/j*/w*/s*/f* were
#    last checked in r01 and have not been re-recorded since.
# Everything else is green across the r01-r04 union and yields last.
_FRONT = [
    # --- tier 1: round-4 red rows, fixed this round ---
    "ev14_incremental_rollup",
    "st10_stream_rollup",
    "ev09_sketch_rollup",
    # --- tier 2: never driver-checked (round-4 additions) ---
    "a11_unload_roundtrip",
    "aj02_asof_forward_tolerance",
    "dd13_crossmodal_dedup",
    "ev13_level_shifts",
    "io01_format_roundtrip",
    "mm05_frame_sampling",
    "mm06_image_resize",
    "mm07_audio_frame_features",
    "sp07_kfold",
    "sp08_fixed_per_group",
    "ss08_range_search",
    "st09_stream_enrich",
    "tx15_bigram_fluency",
    # --- tier 3: NEW this round (portable Bloom membership prefilter;
    # exact substring dedup; incremental IVF index), then changed-code
    # re-verifies ---
    "ev15_bloom_prefilter",
    "dd14_substring_dedup",
    "ss09_incremental_ivf_index",
    "sp09_training_shards",
    "b23_qualify",
    "ev12_quantile_sample_rollup",
    "ev10_kmv_distinct_rollup",
    "st06_stream_snapshot_ingest",
    "st08_stream_cdc_upsert",
    "tt16_catalog_version_travel",
    # --- tier 4: r01-cohort drift re-verifies (not re-recorded since
    # round 1; a ~50-entry budget covers b01-b21 fully and reaches into
    # j*; the w*/s*/f* remainder rotates to the front next round) ---
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
    "j01_inner_join",
    "j02_multi_join",
    "j03_left_join",
    "j04_semi_join",
    "j05_anti_join",
    "j06_full_outer",
    "j07_cross_join",
    "j08_range_join",
    "j09_self_join",
    "j10_bucketed_join",
    "w01_topk_per_group",
    "w02_rank_dense",
    "w03_lag_lead",
    "w04_running_sum",
    "w05_ntile_percent",
    "w06_sessionize",
    "w07_moving_average",
    "w08_distribution_functions",
    "w09_time_range_frame",
    "s01_union_all",
    "s02_union_distinct",
    "s03_intersect",
    "s04_except",
    "s05_set_ops_all",
    "f01_string_functions",
    "f02_date_functions",
    "f03_math_functions",
    "f04_conditional_functions",
    "f05_hash_functions",
    "f06_regex_functions",
    "f07_array_functions",
    "f08_map_functions",
]

# Entries a prior CORRECTNESS run already recorded green (r01–r04 union:
# 189 green of 192 checked; the 3 non-green are all in _FRONT tier 1) —
# yielded last. Prefix-matched on the name's first underscore token.
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
