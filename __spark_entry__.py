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
   entries, then families already proved green across the r01–r07
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
# Round-8 ordering (registry: 225 entries, ALL oracle-backed; new this
# round: ss11_margin_mining_lsh — margin mining in the two-LARGE-sides
# configuration, candidates from LSH-bucketed top-k; ss12_mmr_rerank —
# MMR diversity re-ranking with an unrolled greedy oracle;
# sp12_curriculum_order — curriculum schedule over the two-phase
# cumsum; tx17_ngram_novelty — first-introduction novelty
# attribution; rag01_retrieval_pipeline — the chunk -> hash-embed ->
# retrieve -> same-doc-eval retrieval flagship; ss13_mmr_rerank_lsh —
# MMR over an LSH-bucketed pool, the two-stage retrieve-then-rerank;
# pr05_calibration_bins — reliability-diagram score calibration;
# sp13_mix_manifest — per-(source, split) training-mix accounting over
# the curated set with a PORTABLE md5 split). The cross-round union is 217/217 green at latest check
# and nothing is older than r03, so this round's budget goes to the
# new/changed entries and then rotates the OLDEST green cohort (the 44
# entries whose latest verdict is r03). Tiers:
# 1. new this round (ss11/ss12/ss13/sp12/sp13/tx17/rag01/pr05) + changed-code
#    re-verifies:
#    margin_mining's pair-key dedupe + topk hook (ss10), the
#    cache-registry threading and optional lazy max-df diagnostic
#    through the inverted-index builder (dd04/dd15) and
#    curate_documents (cu01, cu07);
# 2. the 44 entries last driver-checked in ROUND 3 — the oldest cohort
#    in the union (a09/a10, aj01, c04, cu02/cu04/cu05, dd12, f09/f10,
#    j10, mm01/mm02/mm04, pr01-pr03, rj01, s05, sp01, st01-st05,
#    tpch_q1, tt05/tt06/tt08/tt09, tx01-tx03/tx06-tx08/tx10-tx14,
#    w03/w06/w09).
# Everything else was checked r04-r07 and yields after these.
_FRONT = [
    # --- tier 1: new + changed-code re-verifies ---
    "ss11_margin_mining_lsh",
    "ss12_mmr_rerank",
    "ss13_mmr_rerank_lsh",
    "rag01_retrieval_pipeline",
    "pr05_calibration_bins",
    "sp13_mix_manifest",
    "sp12_curriculum_order",
    "tx17_ngram_novelty",
    "ss10_margin_mining",
    "dd04_ngram_jaccard",
    "dd15_containment_pairs",
    "cu01_curated_documents",
    "cu07_end_to_end_pipeline",
    # --- tier 2: r03-cohort drift re-verifies (oldest in the union) ---
    "a09_unpivot",
    "a10_grouping_flags",
    "aj01_asof_join",
    "c04_recursive_cte",
    "cu02_curation_report",
    "cu04_length_band_filter",
    "cu05_contamination_report",
    "dd12_passage_dedup",
    "f09_edit_distance",
    "f10_bitwise_functions",
    "j10_bucketed_join",
    "mm01_media_metadata",
    "mm02_decode_pipeline",
    "mm04_audio_decode",
    "pr01_table_profile",
    "pr02_correlation_matrix",
    "pr03_quality_expectations",
    "rj01_bucketized_range_join",
    "s05_set_ops_all",
    "sp01_dataset_split",
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
    "tx11_pii_scrub",
    "tx12_repetition_stats",
    "tx13_rarity_scores",
    "tx14_sliding_chunks",
    "w03_lag_lead",
    "w06_sessionize",
    "w09_time_range_frame",
]

# Entries a prior CORRECTNESS run already recorded green (r01–r07 union:
# 217/217 distinct entries checked, all green at latest check) — yielded
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
