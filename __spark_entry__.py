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
   order: first this round's fix verifications and the entries no prior
   CORRECTNESS run has checked (see ``_FRONT``), then remaining
   unchecked entries, then families already proved green. Nothing is
   dropped — a driver with budget for all 167 still checks all 167.

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
# Round-3 ordering: the three round-2 failures' fixes first (w03/w06 were
# the TIMESTAMP_NTZ regression, fixed in sources/testdata.py:load_table;
# tpch_q1 was a decimal-representation hash mismatch, fixed with the q3
# sum→DECIMAL(28,4)→DOUBLE construction), then every entry no CORRECTNESS
# run has ever checked (r01+r02 covered 96 of a registry that has since
# grown to 167; 71 remain vs a ~50/round budget). Within the unchecked
# set: environment-coupled families first (streaming watermarks, catalog
# temp-table machinery — the class that produced both prior rounds'
# failures), then oracle-backed documents-only entries, rows-only last
# (a hash verdict is strictly more informative, and the rows-only
# entries are already recall/accuracy-pinned by pytest). Entries past
# the budget line roll to round 4; all were locally gated this round.
_FRONT = [
    # round-2 failures, fixed
    "w03_lag_lead",
    "w06_sessionize",
    "tpch_q1_pricing_summary",
    # temporal joins + leftover window/agg/function entries
    "aj01_asof_join",
    "rj01_bucketized_range_join",
    "j10_bucketed_join",
    "w09_time_range_frame",
    "a09_unpivot",
    "a10_grouping_flags",
    "c04_recursive_cte",
    "b20_lateral_explode",
    "b21_variant_extraction",
    "f09_edit_distance",
    "f10_bitwise_functions",
    "s05_set_ops_all",
    # streaming + catalog entries moved ahead of the documents-only text
    # blocks: they are the environment-coupled families (driver-session
    # watermarks, temp-table machinery) that have never seen a driver
    # verdict — exactly the class that produced r1's and r2's failures.
    "st01_windowed_stream",
    "st02_session_stream",
    "st03_sliding_stream",
    "st04_stream_stream_join",
    "st05_stateful_running_totals",
    "st06_stream_snapshot_ingest",
    "tt05_schema_evolution",
    "tt06_stats_pruned_scan",
    "tt07_metadata_tables",
    "tt08_wap_publish",
    "tt09_catalog_transaction",
    # text analysis (oracle-backed; tx04/tx05 are rows-only, below)
    "tx01_token_counts",
    "tx02_lang_stats",
    "tx03_quality_features",
    "tx06_bpe_token_estimate",
    "tx07_vocabulary",
    "tx08_bigram_counts",
    "tx10_bm25_ranking",
    "tx11_pii_scrub",
    "tx12_repetition_stats",
    "tx13_rarity_scores",
    "tx14_sliding_chunks",
    # curation + decontamination
    "cu01_curated_documents",
    "cu02_curation_report",
    "cu03_decontaminate",
    "cu04_length_band_filter",
    "cu05_contamination_report",
    "dd12_passage_dedup",
    # multimodal plumbing (mm03 is rows-only, below)
    "mm01_media_metadata",
    "mm02_decode_pipeline",
    "mm04_audio_decode",
    # profiling / splits / skew
    "pr01_table_profile",
    "pr02_correlation_matrix",
    "pr03_quality_expectations",
    "sp01_dataset_split",
    "sp02_stratified_sample",
    "sp03_global_shuffle",
    "sp04_sequence_packing",
    "sp05_epoch_mix",
    "sp06_temperature_weights",
    "sk01_salted_aggregate",
    "sk02_salted_join",
    # hypertable rollup + time travel
    "ev08_hypertable_rollup",
    "ev09_sketch_rollup",
    "tt01_timestamp_as_of",
    "tt02_version_as_of",
    "tt03_snapshot_changelog",
    "tt04_sql_text_time_travel",
    # oracle-backed dedup / similarity
    "dd09_fuzzy_linkage",
    "ss06_embedding_centroids",
    # --- rows-only tail (weaker driver verdict; pytest pins quality) ---
    "dd03_minhash_lsh_pairs",
    "dd05_simhash_pairs",
    "dd06_embedding_dedup",
    "ss02_lsh_topk",
    "ss03_ivf_topk",
    "ss05_quantized_topk",
    "tx04_language_id",
    "tx05_fingerprints",
    "mm03_feature_extraction",
    "dd10_incremental_dedup",
    "dd11_semantic_dedup",
]

# Entries a prior CORRECTNESS run already recorded green (r01 + r02) —
# yielded last. Prefix-matched on the name's first underscore token.
_PROVEN = frozenset(
    [f"b{i:02d}" for i in range(1, 20)]  # b01–b19 (b19 green in r02)
    + [f"j{i:02d}" for i in range(1, 10)]
    + ["w01", "w02", "w04", "w05", "w07", "w08"]
    + [f"a{i:02d}" for i in range(1, 9)]
    + [f"s{i:02d}" for i in range(1, 5)]
    + [f"c{i:02d}" for i in range(1, 4)]
    # r02 greens: full TPC-H suite (q1's fix is in _FRONT), scalar
    # functions, event analytics, oracled dedup/similarity, tx09
    + ["tpch"]
    + [f"f{i:02d}" for i in range(1, 9)]
    + [f"ev{i:02d}" for i in range(1, 8)]
    + ["dd01", "dd02", "dd04", "dd07", "dd08", "ss01", "ss04", "tx09"]
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
