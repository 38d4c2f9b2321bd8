"""Driver-session conformance: the `__spark_entry__` contract must hold on
a SparkSession that was built WITHOUT this engine's `session.py` defaults.

Both prior rounds' only failures came from exactly this environment class:
round 1 broke on TIMESTAMP(NANOS) parquet reads, round 2 on TIMESTAMP_NTZ
inference — in each case our tuned test session masked what the driver's
bare session exposed.  This test emulates a bare session by cloning a new
isolated-SQLConf session (`newSession()`) and *unsetting* every conf the
`__spark_entry__._tuned` wrapper is responsible for re-establishing, then
runs one events/timestamp-based entry and one decimal-based entry end to
end.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


@pytest.fixture()
def bare_spark(spark):
    bare = spark.newSession()
    for key in entrymod._TUNED_CONFS:
        try:
            bare.conf.unset(key)
        except Exception:  # noqa: BLE001 — conf may have no session override
            pass
    return bare


@pytest.mark.parametrize(
    "name",
    [
        # timestamp path: lag/unix_micros over events.ts — r1's and r2's
        # failure mode (nanos-as-long, TIMESTAMP_NTZ inference)
        "w06_sessionize",
        # decimal path: 8-aggregate pricing summary with decimal→double
        # output contract
        "tpch_q1_pricing_summary",
        # streaming path: withWatermark rejects NTZ outright
        "st01_windowed_stream",
        # as-of join: unix_micros over events.ts on both join sides
        "aj01_asof_join",
        # hypertable rollup: events aggregation through the snapshot layer
        "ev08_hypertable_rollup",
        # round-4 timestamp-path entries: bottom-k sample cascade
        # (date_trunc buckets), stream-static enrichment (watermark), and
        # the forward/tolerance as-of (unix_micros on both sides)
        "ev12_quantile_sample_rollup",
        "st09_stream_enrich",
        "aj02_asof_forward_tolerance",
        # round-5 entries: bloom bitmap arithmetic + events timestamps,
        # window hashing over documents, Arrow GEMM routing + snapshot
        # commits, and the partitioned shard write + read-back manifest
        "ev15_bloom_prefilter",
        "dd14_substring_dedup",
        "ss09_incremental_ivf_index",
        "sp09_training_shards",
        # round-6 entry: the full curation→packing→shard-write chain —
        # regex tokenization, two-phase cumsum, partitioned write, and
        # the disk read-back joins, all on a bare session
        "sp10_corpus_to_shards",
        # DSIR selection: log/decimal bucket weights + broadcast top-k
        "cu08_dsir_selection",
        # containment: shared inverted shingle index, directed union
        "dd15_containment_pairs",
        # round-7 multimodal flagship: curation → WAV+BMP render →
        # chained decode_audio/decode_images mapInPandas → joint gate →
        # partitioned shard write certified from the read-back
        "mm08_multimodal_to_shards",
        # round-7 no-split packing: hash-routed applyInPandas greedy
        # first-fit with a recursive-CTE oracle
        "sp11_greedy_packing",
        # round-7 budget selection: hex-key ordering + two-phase cumsum
        "cu09_token_budget_selection",
        # round-7 bitext mining: dual cosine_topk + rank-ordered folds
        "ss10_margin_mining",
    ],
)
def test_entry_runs_on_bare_session(bare_spark, sf_dir, name):
    df = entrymod.queries()[name](bare_spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    # the events-based entries must come out as tz-aware TIMESTAMP, never
    # NTZ (unix_micros/withWatermark reject NTZ; oracle hashes depend on
    # the UTC instant)
    assert "timestamp_ntz" not in dict(df.dtypes).values()


def test_entry_smoke_on_bare_session(bare_spark):
    df = entrymod.entry(bare_spark)
    assert df.count() > 0
