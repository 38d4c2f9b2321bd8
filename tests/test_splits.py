"""Deterministic split operator invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from trino_iceberg_spark.operators.splits import split_by_hash
from trino_iceberg_spark.sources.testdata import load_table

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_deterministic_and_stable_under_subsets(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    full = {r["doc_id"]: r["split"] for r in split_by_hash(d, "doc_id", WEIGHTS).collect()}
    # Same assignment when computed twice.
    again = {r["doc_id"]: r["split"] for r in split_by_hash(d, "doc_id", WEIGHTS).collect()}
    assert full == again
    # Removing other rows must not move anyone's split (randomSplit fails this).
    subset = split_by_hash(d.filter(F.col("doc_id") % 3 == 0), "doc_id", WEIGHTS)
    for r in subset.collect():
        assert full[r["doc_id"]] == r["split"]


def test_split_fractions_approximate_weights(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n = d.count()
    counts = {
        r["split"]: r["c"]
        for r in split_by_hash(d, "doc_id", WEIGHTS)
        .groupBy("split").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert set(counts) == set(WEIGHTS)
    for name, w in WEIGHTS.items():
        assert abs(counts[name] / n - w) < 0.06  # 500 docs → generous tolerance


def test_group_key_coassignment(spark, sf_dir):
    """Hashing a group key assigns every member of the group together."""
    d = load_table(spark, sf_dir, "documents")
    by_src = split_by_hash(d, "source", WEIGHTS)
    per_group = by_src.groupBy("source").agg(F.count_distinct("split").alias("k"))
    assert all(r["k"] == 1 for r in per_group.collect())


def test_bad_weights_rejected(spark):
    import pytest

    with pytest.raises(ValueError):
        split_by_hash(spark.range(5), "id", {"a": 0.5, "b": 0.2})


def test_sample_deterministic_superset_stability(spark, sf_dir):
    from trino_iceberg_spark.operators.splits import sample_deterministic

    d = load_table(spark, sf_dir, "documents")
    half = d.filter(F.col("doc_id") % 2 == 0)
    full_ids = {r["doc_id"] for r in sample_deterministic(d, "doc_id", 0.2).collect()}
    half_ids = {r["doc_id"] for r in sample_deterministic(half, "doc_id", 0.2).collect()}
    # sample of a subset == subset of the sample (pure function of key)
    assert half_ids == {i for i in full_ids if i % 2 == 0}
    n = d.count()
    assert abs(len(full_ids) / n - 0.2) < 0.06


def test_sample_stratified_rebalances(spark, sf_dir):
    from trino_iceberg_spark.operators.splits import sample_stratified

    d = load_table(spark, sf_dir, "documents")
    out = sample_stratified(d, "doc_id", "lang", {"en": 0.1, "zh": 1.0})
    counts = {r["lang"]: r["c"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()}
    totals = {r["lang"]: r["c"] for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert set(counts) <= {"en", "zh"}  # unlisted strata dropped
    assert counts["zh"] == totals["zh"]  # keep-all stratum intact
    assert counts["en"] < totals["en"] * 0.3  # en heavily downsampled


def test_global_shuffle_total_order_and_reproducible(spark):
    from trino_iceberg_spark.operators.splits import global_shuffle

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = global_shuffle(df, "doc_id", seed=7)
    keys = [r["shuffle_key"] for r in a.toLocalIterator()]  # partition order
    assert keys == sorted(keys)  # total order across partition boundaries
    b = [r["doc_id"] for r in global_shuffle(df, "doc_id", seed=7).toLocalIterator()]
    c = [r["doc_id"] for r in global_shuffle(df, "doc_id", seed=8).toLocalIterator()]
    assert b == [r["doc_id"] for r in a.toLocalIterator()]  # same seed = same order
    assert b != c  # new epoch seed = new order


def test_pack_sequences_covers_stream_without_gaps(spark, sf_dir):
    """Offsets tile the concatenated token stream exactly: sorted by key,
    each start_offset equals the previous document's start + count."""
    from trino_iceberg_spark.operators.packing import pack_sequences
    from trino_iceberg_spark.operators.text import token_count_col

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count_col(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(d, "doc_id", "n_tokens", seq_len=128).collect()
    packed.sort(key=lambda r: r["pack_key"])
    expect = 0
    for r in packed:
        assert r["start_offset"] == expect
        expect += r["n_tokens"]
    total = sum(r["n_tokens"] for r in packed)
    assert expect == total
    # chunk span consistent with the interval
    for r in packed:
        if r["n_tokens"] > 0:
            assert r["first_chunk"] == r["start_offset"] // 128
            assert r["last_chunk"] == (r["start_offset"] + r["n_tokens"] - 1) // 128
            assert r["n_chunks"] == r["last_chunk"] - r["first_chunk"] + 1


def test_pack_sequences_stable_under_repartition(spark, sf_dir):
    """The two-phase cumsum is layout-independent: same offsets whatever
    the input partitioning (spark_partition_id-based schemes fail this)."""
    from trino_iceberg_spark.operators.packing import pack_sequences
    from trino_iceberg_spark.operators.text import token_count_col

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count_col(F.col("text")).alias("n_tokens")
    )
    a = {r["doc_id"]: r["start_offset"]
         for r in pack_sequences(d, "doc_id", "n_tokens", 128).collect()}
    b = {r["doc_id"]: r["start_offset"]
         for r in pack_sequences(d.repartition(17), "doc_id", "n_tokens", 128).collect()}
    assert a == b


def test_mix_epochs_replication_and_determinism(spark, sf_dir):
    from trino_iceberg_spark.operators.splits import mix_epochs

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    mixed = mix_epochs(d, {"src0": 2.0, "src1": 0.5}, "source", "doc_id")
    rows = mixed.collect()
    # integer weight: every src0 doc appears exactly twice (epochs 1, 2)
    src0_ids = [r["doc_id"] for r in d.filter(F.col("source") == "src0").collect()]
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    for i in src0_ids:
        assert sorted(per_doc[i]) == [1, 2]
    # fractional weight: src1 docs appear 0 or 1 times, roughly half
    n_src1 = d.filter(F.col("source") == "src1").count()
    kept = sum(1 for r in rows if r["source"] == "src1")
    assert 0 < kept < n_src1
    # sources not in the mix are dropped
    assert not any(r["source"] == "src2" for r in rows)
    # deterministic across runs
    again = mix_epochs(d, {"src0": 2.0, "src1": 0.5}, "source", "doc_id").collect()
    assert sorted((r["doc_id"], r["epoch"]) for r in rows) == sorted(
        (r["doc_id"], r["epoch"]) for r in again
    )


def test_mix_epochs_rejects_negative(spark):
    import pytest

    from trino_iceberg_spark.operators.splits import mix_epochs

    with pytest.raises(ValueError):
        mix_epochs(spark.range(3).withColumn("source", F.lit("a")),
                   {"a": -1.0}, "source", "id")


def test_kfold_co_assignment_and_determinism(spark, sf_dir):
    from trino_iceberg_spark.operators.splits import kfold_column
    from trino_iceberg_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents")
    folded = d.withColumn("fold", kfold_column("source", k=5, seed=42))
    # co-assignment: every source lands in exactly one fold
    per_source = folded.groupBy("source").agg(
        F.count_distinct("fold").alias("nf")
    )
    assert per_source.filter(F.col("nf") != 1).count() == 0
    # folds cover [0, k) and are a pure function of (key, seed):
    folds = {r["fold"] for r in folded.select("fold").distinct().collect()}
    assert folds <= set(range(5)) and len(folds) >= 2
    again = {
        r["source"]: r["fold"]
        for r in d.withColumn("fold", kfold_column("source", k=5, seed=42))
        .select("source", "fold").distinct().collect()
    }
    first = {
        r["source"]: r["fold"]
        for r in folded.select("source", "fold").distinct().collect()
    }
    assert again == first
    # different seed reshuffles at least one source
    other = {
        r["source"]: r["fold"]
        for r in d.withColumn("fold", kfold_column("source", k=5, seed=7))
        .select("source", "fold").distinct().collect()
    }
    assert other != first
    import pytest

    with pytest.raises(ValueError):
        kfold_column("source", k=1)


def test_fixed_per_group_exact_counts_and_nesting(spark, sf_dir):
    from trino_iceberg_spark.operators.splits import sample_fixed_per_group
    from trino_iceberg_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents")
    s5 = sample_fixed_per_group(d, "doc_id", "source", n=5)
    counts = {r["source"]: r["n"] for r in s5.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    group_sizes = {r["source"]: r["n"] for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for src, n in counts.items():
        assert n == min(5, group_sizes[src])
    # nested-subset property: rank <= 2 sample is contained in rank <= 5
    s2_ids = {r["doc_id"] for r in sample_fixed_per_group(d, "doc_id", "source", n=2).select("doc_id").collect()}
    s5_ids = {r["doc_id"] for r in s5.select("doc_id").collect()}
    assert s2_ids <= s5_ids
    # stability: unrelated-row removal never changes another group's picks
    without_one_group = d.filter(F.col("source") != "src0")
    again = {
        r["doc_id"]
        for r in sample_fixed_per_group(without_one_group, "doc_id", "source", n=5)
        .select("doc_id").collect()
    }
    assert again == {r["doc_id"] for r in s5.filter(F.col("source") != "src0").select("doc_id").collect()}
    import pytest

    with pytest.raises(ValueError):
        sample_fixed_per_group(d, "doc_id", "source", n=0)


def test_pack_greedy_nosplit_invariants(spark, sf_dir):
    """No bin ever exceeds seq_len; documents never straddle (offset +
    n_packed <= seq_len); within a packer, a document opens a new bin
    ONLY when it genuinely didn't fit the open one (greedy property);
    oversized docs truncate; zero-token docs take no space; and the
    placement is a pure function of ids (stable under repartition)."""
    from pyspark.sql import functions as F

    from trino_iceberg_spark.operators.packing import pack_greedy_nosplit
    from trino_iceberg_spark.operators.text import token_count_col
    from trino_iceberg_spark.sources.testdata import load_table

    L = 128
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count_col(F.col("text")).alias("n_tokens")
    )
    rows = pack_greedy_nosplit(
        d, "doc_id", "n_tokens", seq_len=L, num_packers=4
    ).collect()
    assert len(rows) == d.count()
    fills: dict = {}
    for r in rows:
        assert 0 <= r["n_packed"] <= L  # truncation bound
        assert r["bin_offset"] + r["n_packed"] <= L  # never straddles
        key = (r["packer"], r["bin"])
        fills[key] = max(fills.get(key, 0), r["bin_offset"] + r["n_packed"])
    # greedy property: every non-first bin's predecessor was too full for
    # the FIRST doc placed in that bin (its bin_offset is 0 and it did
    # not fit at the predecessor's final fill)
    first_in_bin = {}
    for r in sorted(rows, key=lambda r: (r["packer"], r["bin"], r["bin_offset"])):
        first_in_bin.setdefault((r["packer"], r["bin"]), r)
    for (packer, b), r in first_in_bin.items():
        if b == 0:
            continue
        assert r["bin_offset"] == 0
        prev_fill = fills[(packer, b - 1)]
        assert prev_fill + max(r["n_packed"], 1) > L
    # stable under physical layout
    again = {
        (r["doc_id"]): (r["packer"], r["bin"], r["bin_offset"])
        for r in pack_greedy_nosplit(
            d.repartition(17), "doc_id", "n_tokens", seq_len=L, num_packers=4
        ).collect()
    }
    assert again == {
        r["doc_id"]: (r["packer"], r["bin"], r["bin_offset"]) for r in rows
    }


def test_pack_greedy_nosplit_truncation_and_zero(spark):
    """A doc longer than seq_len is truncated to a full bin of its own;
    zero-token docs keep the open bin and offset."""
    from trino_iceberg_spark.operators.packing import pack_greedy_nosplit

    d = spark.createDataFrame(
        [(1, 1000), (2, 0), (3, 60), (4, 60)], "id long, n long"
    )
    rows = {
        r["id"]: r
        for r in pack_greedy_nosplit(
            d, "id", "n", seq_len=100, num_packers=1
        ).collect()
    }
    assert rows[1]["n_packed"] == 100  # truncated
    assert rows[2]["n_packed"] == 0
    assert rows[2]["bin_offset"] + rows[2]["n_packed"] <= 100
    # all four in packer 0; total bins consistent with greedy
    assert all(r["packer"] == rows[1]["packer"] for r in rows.values())


def test_portable_split_assignment_replayable(spark):
    """portable=True must make split membership recomputable from md5
    alone (the write_training_shards portability contract), keep the
    xxhash64 default untouched, and hold fractions within tolerance."""
    import hashlib

    from trino_iceberg_spark.operators.splits import split_by_hash

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    rows = split_by_hash(df, "doc_id", w, seed=42, portable=True).collect()
    for r in rows[:200]:
        b = int(hashlib.md5(f"{r['doc_id']}-42".encode()).hexdigest()[:15], 16) % 1_000_000
        want = "train" if b < 800_000 else ("val" if b < 900_000 else "test")
        assert r["split"] == want
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    # the two hash families disagree on membership (different functions)
    # but both produce the right fractions
    xx = {r["doc_id"]: r["split"] for r in split_by_hash(df, "doc_id", w, seed=42).collect()}
    md = {r["doc_id"]: r["split"] for r in rows}
    assert xx != md


def test_portable_split_assignment_null_keys_hash_deterministically(spark):
    """NULL keys must route through the sentinel hash in the portable
    path — not silently all fall into the LAST split via NULL
    comparisons (ADVICE r8). Membership stays md5-replayable via the
    documented '\\x00null' sentinel."""
    import hashlib

    from pyspark.sql import functions as F

    from trino_iceberg_spark.operators.splits import split_by_hash

    df = spark.range(50).select(
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id").cast("string")).alias("doc_id")
    )
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    rows = split_by_hash(df, "doc_id", w, seed=7, portable=True).collect()
    b = int(hashlib.md5("\x00null-7".encode()).hexdigest()[:15], 16) % 1_000_000
    want = "train" if b < 800_000 else ("val" if b < 900_000 else "test")
    null_splits = {r["split"] for r in rows if r["doc_id"] is None}
    assert null_splits == {want}
    # non-null keys are untouched by the guard (coalesce is a no-op)
    for r in rows[:20]:
        if r["doc_id"] is None:
            continue
        bb = int(hashlib.md5(f"{r['doc_id']}-7".encode()).hexdigest()[:15], 16) % 1_000_000
        ww = "train" if bb < 800_000 else ("val" if bb < 900_000 else "test")
        assert r["split"] == ww
