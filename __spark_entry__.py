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
   entries, then families already proved green across the r01–r09
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
# Round-10 ordering (registry: 229 entries, ALL oracle-backed; new this
# round: tt17_merge_on_read_delete — Iceberg v2 position deletes with
# the anti-join read path replayed in the oracle — tt18_equality_delete_cdc
# — Iceberg v2 equality deletes, the streaming-CDC upsert mechanism,
# horizon rule replayed in the oracle — and cu10_domain_curation —
# C4/RefinedWeb-style per-domain gating). Per the round-9 VERDICT
# directive #1, rotation keeps winning: new entries capped at 3 (under
# the ~5 cap), and the budget re-verifies the FULL 40-entry r05 cohort
# so the cross-round union ends with zero entries older than r06.
# Tiers (3+4+40 = 47, under the ~50 driver budget):
# 1. tt17/tt18/cu10 (new);
# 2. changed-code re-verifies: the catalog's metadata format moved to
#    two-level manifest lists this round (catalog/snapshots.py), so the
#    catalog-heavy entries NOT already in the r05 cohort re-verify —
#    st06 (exactly-once ingest commits), tt03 (changelog, now with the
#    MOR fallback), tt10 (SQL MERGE through _rewrite_commit), plus sp13
#    (portable-split sentinel guard landed in split_assignment);
# 3. the 40-entry r05 cohort — the oldest in the union (computed from
#    the CORRECTNESS_r01–r09 latest-check union; tt16/st08/st09/aj02 et
#    al. double as changed-code coverage for the catalog format change).
# Everything else was checked r06–r09 and yields after these.
_FRONT = [
    # --- tier 1: new this round ---
    "tt17_merge_on_read_delete",
    "tt18_equality_delete_cdc",
    "cu10_domain_curation",
    # --- tier 2: changed-code re-verifies ---
    "st06_stream_snapshot_ingest",
    "tt03_snapshot_changelog",
    "tt10_sql_merge",
    "sp13_mix_manifest",
    # --- tier 3: r05 cohort (oldest in the union) ---
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
    "b23_qualify",
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
    "ss08_range_search",
    "st08_stream_cdc_upsert",
    "st09_stream_enrich",
    "tt16_catalog_version_travel",
    "tx15_bigram_fluency",
]

# Entries a prior CORRECTNESS run already recorded green (r01–r09 union:
# 226/226 distinct entries checked, all green at latest check) — yielded
# last. Prefix-matched on the name's first underscore token.
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
