"""Deterministic dataset splitting for training pipelines.

Train/val/test assignment must be a pure function of the example's
identity — reproducible across runs, stable under re-partitioning, and
immune to adding/removing OTHER rows (which `randomSplit` is not: its
sampling is per-partition and reshuffles membership whenever the input
layout changes). The standard construction hashes the id into [0, 1) and
cuts at the cumulative weights; a whole document family can be co-assigned
by hashing a group key (e.g. URL domain) instead of the row id — the
leakage-safe split for near-duplicate corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "split_assignment",
    "split_by_hash",
    "sample_deterministic",
    "sample_stratified",
    "global_shuffle",
    "mix_epochs",
    "shuffle_key",
    "temperature_weights",
    "kfold_column",
    "sample_fixed_per_group",
    "write_training_shards",
    "curriculum_order",
]

_BUCKETS = 1_000_000


def shuffle_key(id_col: Column | str, seed: int) -> Column:
    """THE reproducible shuffle key: ``md5(id ∥ '-' ∥ seed)``. One shared
    construction because cross-engine oracles replay the exact key TEXT —
    :func:`global_shuffle`, ``packing.pack_sequences``, and
    ``packing.pack_greedy_nosplit`` must stay bit-identical or their
    determinism contracts silently fork. md5 (not xxhash64) so any
    standard library reproduces the order."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat(c.cast("string"), F.lit(f"-{seed}")))


def split_assignment(
    key: Column | str,
    weights: dict[str, float],
    seed: int = 42,
    portable: bool = False,
) -> Column:
    """Column expression assigning each row a split name by hashed key.

    ``weights`` maps split name → fraction (must sum to ~1). The key's
    hash folds to a bucket in [0, 1e6); cumulative cut points partition
    the bucket space, so fractions are exact to 1e-6 in expectation and
    every row's split is a pure function of (key, seed).

    ``portable=False`` (default) buckets with seeded xxhash64 — the
    throughput path. ``portable=True`` buckets with
    :func:`~..operators.dedup.portable_hash64` over the same
    ``key ∥ '-' ∥ seed`` text :func:`shuffle_key` uses, so any external
    system (a dataloader, a SQL engine, an audit notebook) can recompute
    every row's membership from md5 alone — the same portability
    contract :func:`write_training_shards` already makes for shards.

    NULL keys hash a sentinel text (``'\\x00null'``) in the portable
    path, so NULL-key rows land in a deterministic hashed split exactly
    like the xxhash64 path routes them (which hashes NULL to a
    seed-determined bucket natively) — without the guard,
    ``concat(NULL)`` made the bucket NULL, every ``bucket < cut``
    comparison NULL, and ALL NULL-key rows silently fell into the last
    split (ADVICE r8). A GENUINE key equal to the sentinel would hash
    identically to NULL keys and silently merge their assignment, so the
    expression raises on one (ADVICE r9) — one JVM-side comparison per
    row, zero cost on real data, where a NUL control byte never starts a
    key. External replayers must use the same sentinel for NULL keys;
    prefer non-null keys."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1 (got {total})")
    c = F.col(key) if isinstance(key, str) else key
    if portable:
        from .dedup import portable_hash64

        _SENTINEL = "\x00null"
        key_str = c.cast("string")
        key_text = F.concat(
            F.when(
                key_str == _SENTINEL,
                F.raise_error(
                    F.lit(
                        "split_assignment(portable=True): a key equals the "
                        "reserved NULL sentinel '\\x00null' — its split "
                        "would silently merge with NULL-key rows"
                    )
                ).cast("string"),
            ).otherwise(F.coalesce(key_str, F.lit(_SENTINEL))),
            F.lit(f"-{seed}"),
        )
        bucket = F.pmod(portable_hash64(key_text), F.lit(_BUCKETS))
    else:
        bucket = F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(_BUCKETS))
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cut = int(acc * _BUCKETS)
        branch = (F.lit(name), bucket < cut)
        expr = F.when(branch[1], branch[0]) if expr is None else expr.when(branch[1], branch[0])
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def sample_deterministic(
    df: DataFrame, key: Column | str, fraction: float, seed: int = 42
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose hashed key lands
    below the cut. Unlike ``df.sample``, membership is a pure function of
    (key, seed) — stable across runs, partitionings, and subsets, and the
    SAME rows are picked when re-run on a superset (incremental-ingest
    friendly: yesterday's sample is a subset of today's)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1] (got {fraction})")
    c = F.col(key) if isinstance(key, str) else key
    cut = int(fraction * _BUCKETS)
    return df.filter(F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(_BUCKETS)) < cut)


def sample_stratified(
    df: DataFrame,
    key: Column | str,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling (corpus rebalancing: e.g. keep
    10% of English, 100% of low-resource languages). Strata missing from
    ``fractions`` are dropped — the rebalance is explicit. Map-side only:
    a filter on (hash(key), stratum), no shuffle, no sampling state."""
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for stratum {name!r} must be in [0, 1]")
    c = F.col(key) if isinstance(key, str) else key
    bucket = F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(_BUCKETS))
    cond = None
    for name, frac in fractions.items():
        branch = (F.col(strata_col) == name) & (bucket < int(frac * _BUCKETS))
        cond = branch if cond is None else cond | branch
    return df.filter(cond if cond is not None else F.lit(False))


def split_by_hash(
    df: DataFrame,
    key: Column | str,
    weights: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
    portable: bool = False,
) -> DataFrame:
    """Annotate ``df`` with a deterministic split column (map-side only —
    no shuffle, no sampling state)."""
    return df.withColumn(
        split_col, split_assignment(key, weights, seed, portable=portable)
    )


def mix_epochs(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Deterministic source-weighted data mixing via epoch upsampling —
    the standard pretraining-mixture construction (each source gets a
    repeat factor, e.g. 2.0 epochs of encyclopedic text, 0.3 of raw web).

    ``weights`` maps source value → epochs.  Each row is replicated
    ``floor(w)`` times (epoch = 1..floor(w)); a final *fractional* epoch
    keeps each row with probability ``frac(w)``, decided by comparing an
    md5 prefix of (id, seed, epoch) against the fraction's 8-hex-digit
    cutoff — a pure function of (id, seed), so the mix is reproducible
    across runs, partitionings, and engines (md5, not xxhash64, so any
    external system can replay membership).  Sources absent from
    ``weights`` are dropped — the mixture is explicit.

    Map-side only: one ``explode(sequence(...))`` + filter; no shuffle,
    no sampling state, output size = Σ rows·weight in expectation."""
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"epochs for source {name!r} must be >= 0")
    src = F.col(source_col)
    id_str = F.col(id_col).cast("string")

    n_epochs = None  # total replicas incl. the fractional epoch, per source
    keep_extra = None  # fractional-epoch membership test, per source
    for name, w in weights.items():
        full = int(w)
        frac = w - full
        total = full + (1 if frac > 0 else 0)
        branch = src == name
        n_epochs = (
            F.when(branch, total)
            if n_epochs is None
            else n_epochs.when(branch, total)
        )
        if frac > 0:
            # md5 hex is uniform on [0, 16^32); comparing a fixed-width
            # lowercase-hex prefix lexicographically == numeric compare.
            cutoff = format(int(frac * 16**8), "08x")
            test = (
                F.substring(
                    F.md5(F.concat(id_str, F.lit(f"-{seed}-"), F.lit(str(total)))),
                    1,
                    8,
                )
                < cutoff
            )
        else:
            test = F.lit(True)  # no fractional epoch → epoch filter suffices
        keep_extra = (
            F.when(branch, test) if keep_extra is None else keep_extra.when(branch, test)
        )
    if n_epochs is None:
        return df.filter(F.lit(False)).withColumn(epoch_col, F.lit(1))
    n_epochs = n_epochs.otherwise(F.lit(0))
    keep_extra = keep_extra.otherwise(F.lit(False))

    full_epochs = None
    for name, w in weights.items():
        full_epochs = (
            F.when(src == name, int(w))
            if full_epochs is None
            else full_epochs.when(src == name, int(w))
        )
    full_epochs = full_epochs.otherwise(F.lit(0))

    return (
        df.withColumn("_n_ep", n_epochs)
        .filter(F.col("_n_ep") > 0)
        .withColumn(epoch_col, F.explode(F.sequence(F.lit(1), F.col("_n_ep"))))
        .filter((F.col(epoch_col) <= full_epochs) | keep_extra)
        .drop("_n_ep")
    )


def global_shuffle(
    df: DataFrame, id_col: str, seed: int = 42, key_col: str = "shuffle_key"
) -> DataFrame:
    """Deterministic global shuffle for training-order randomization:
    every row gets a pseudorandom but reproducible ``key_col`` =
    md5(id ∥ seed), and the frame comes back range-partitioned and sorted
    by it — a total order across partition boundaries.

    Scale notes: ``repartitionByRange`` + ``sortWithinPartitions`` is the
    only global ordering that scales — a global ``orderBy`` feeding a
    row_number window would serialize into one partition. Epoch reshuffle
    = new seed, no data rewrite needed if the key is computed at read
    time. md5 (not xxhash64) so external systems can reproduce the exact
    order with any standard library."""
    key = shuffle_key(id_col, seed)
    return (
        df.withColumn(key_col, key)
        .repartitionByRange(key_col)
        .sortWithinPartitions(key_col)
    )


def temperature_weights(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
) -> dict[str, float]:
    """Temperature-based mixture weights (the multilingual/pretraining
    standard, e.g. mBERT/XLM-R exponentiated sampling): source share
    p_s ∝ count_s^alpha, converted to EPOCHS for :func:`mix_epochs` so
    the expected output corpus keeps its original total size —
    ``epochs_s = N · p_s / count_s``. ``alpha < 1`` upweights small
    sources (alpha=0 → uniform across sources, alpha=1 → natural
    distribution unchanged).

    The per-source count aggregate collects #sources rows (the mixture
    spec — inherently driver-sized, like a join's broadcast threshold
    decision); the DATA never leaves executors and the returned dict
    feeds the map-side mix_epochs explode."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    counts = {
        r["src"]: r["c"]
        for r in df.groupBy(F.col(source_col).alias("src"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    total = sum(counts.values())
    mass = sum(c**alpha for c in counts.values())
    return {
        s: (total * (c**alpha / mass)) / c for s, c in counts.items() if c > 0
    }


def kfold_column(key: Column | str, k: int, seed: int = 42) -> Column:
    """Deterministic k-fold cross-validation assignment: fold =
    ``portable_hash64(key || ':' || seed) mod k`` — a pure function of
    (key, seed), so folds are stable across runs, partitionings, and
    engines (the md5-derived hash is replayable in SQL; the sp07 registry
    entry's DuckDB oracle reproduces every assignment).

    Pass a GROUP key (site/domain/source/author) rather than a row id to
    co-assign related rows to the same fold — the leakage guard: near-
    duplicate documents from one source must never straddle a train fold
    and its validation fold. Same discipline as
    :func:`split_assignment`'s group mode, with folds instead of named
    splits. Map-side only: no shuffle, no state. NULL keys fold to NULL
    (they belong to no fold) — filter or impute them upstream."""
    if k < 2:
        raise ValueError(f"k must be >= 2 (got {k})")
    from .dedup import portable_hash64

    c = F.col(key) if isinstance(key, str) else key
    h = portable_hash64(F.concat(c.cast("string"), F.lit(f":{seed}")))
    return F.pmod(h, F.lit(k)).cast("int")


def sample_fixed_per_group(
    df: DataFrame,
    key: Column | str,
    group_col: str,
    n: int,
    seed: int = 42,
) -> DataFrame:
    """Deterministic fixed-size sample PER GROUP: exactly ``min(n, |group|)``
    rows from each group, chosen by ranking the portable md5 hash of the
    row key within the group — the balanced-eval-set constructor ("100
    documents per language", "50 per source"), where fraction-based
    sampling (:func:`sample_stratified`) can't hit exact counts.

    Membership is a pure function of (key, group, seed): stable across
    runs, partitionings, and engines, and adding rows to OTHER groups
    never changes a group's sample. Adds a ``_rank`` column (1-based hash
    rank within the group) useful for nested subsets — rank ≤ 50 is a
    subset of rank ≤ 100 by construction.

    Scale shape: one shuffle on ``group_col`` for the rank window, with
    WindowGroupLimit pushing the ≤ n filter into the sort — no group ever
    materializes fully in one task beyond its top-n."""
    if n < 1:
        raise ValueError(f"n must be >= 1 (got {n})")
    from pyspark.sql import Window as W

    from .dedup import portable_hash64

    c = F.col(key) if isinstance(key, str) else key
    h = portable_hash64(F.concat(c.cast("string"), F.lit(f"#{seed}")))
    # NULL keys hash to NULL and would otherwise sort FIRST, silently
    # stealing every group's top slots; push them last so they only fill
    # leftover capacity.
    w = W.partitionBy(group_col).orderBy(
        h.asc_nulls_last(), c.cast("string").asc_nulls_last()
    )
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= n)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    num_shards: int = 8,
    format: str = "parquet",
) -> DataFrame:
    """Materialize a curated corpus into ``num_shards`` deterministic
    shards plus a MANIFEST — the training-dataloader endpoint: each
    worker reads exactly its shard directory, and the manifest is the
    contract it validates against.

    Shard assignment is ``portable_hash64(id) % num_shards`` — a pure
    function of the example's identity, so re-running the writer on the
    same corpus reproduces byte-identical membership regardless of
    partitioning (the same argument :func:`split_assignment` makes for
    train/val/test). The manifest has one row per shard:
    ``(shard, rows, id_hash_xor)`` where id_hash_xor is the XOR of the
    members' portable id hashes — an ORDER-INDEPENDENT membership
    digest that never overflows 64 bits (a SUM of 2^60-scale hashes
    does) and that any engine can recompute (the sp09 oracle does), so
    a dataloader can verify "I got every row of my shard" without
    reading other shards. (XOR cancels duplicated ids pairwise; ids are
    unique by contract, and ``rows`` catches duplication regardless.)

    Scale shape: one hash-partitioned write (uniform by construction —
    md5 can't skew) laid out as ``shard=<k>/`` hive directories so a
    reader's shard filter prunes at the directory level; the manifest is
    aggregated from the WRITTEN files (a cheap column-pruned read of the
    id column), not from the input plan — so it certifies what actually
    landed on disk, and an expensive upstream pipeline is computed
    exactly once (by the write). No driver-side data; num_shards scales
    freely (1000-GPU jobs use 1000+).
    """
    from pyspark.sql import SparkSession

    from .dedup import portable_hash64

    shard = F.pmod(
        portable_hash64(F.col(id_col).cast("string")), F.lit(num_shards)
    ).cast("int")
    (
        df.withColumn("shard", shard)
        .repartition("shard")
        .write.partitionBy("shard")
        .mode("overwrite")
        .format(format)
        .save(path)
    )
    spark = SparkSession.getActiveSession()
    written = spark.read.format(format).load(path).select("shard", id_col)
    return written.groupBy(F.col("shard").cast("int").alias("shard")).agg(
        F.count(F.lit(1)).alias("rows"),
        F.bit_xor(portable_hash64(F.col(id_col).cast("string"))).alias(
            "id_hash_xor"
        ),
    )


def curriculum_order(
    df: DataFrame,
    id_col: str,
    difficulty_col: str,
    thresholds: list[int | float],
    seed: int = 42,
    easy_first: bool = True,
    phase_col: str = "phase",
    key_col: str = "curriculum_key",
    step_col: str = "global_step",
) -> DataFrame:
    """Curriculum-learning training order (Bengio et al. 2009,
    "Curriculum Learning"): band every row into a difficulty phase by
    fixed ``thresholds`` (phase = number of thresholds the difficulty
    meets, so ``len(thresholds) + 1`` bands, 0 = easiest), shuffle
    deterministically WITHIN each phase, and assign an exact 0-based
    ``global_step`` index over the phase-major order — the schedule a
    trainer consumes directly.

    Thresholds are fixed by the caller (data-independent banding) —
    quantile-based banding belongs to a separate percentile pass; fixed
    bands keep this operator scan-pure and its semantics stable as the
    corpus grows.

    Scale shape: the order key is one hex char of (sort) phase +
    :func:`shuffle_key`'s md5 — lexicographic order IS the curriculum
    order — and the step index comes from
    :func:`~..operators.packing.exclusive_cumsum` of a literal 1 over
    that key (two-phase cumsum: 16^2 buckets per phase via
    ``bucket_prefix_len=3``, never a single-partition global window;
    the phase char is near-constant per phase, so the extra prefix
    length is what keeps buckets plentiful — the hex-key bucketing trap).
    The frame returns range-partitioned and sorted by the key, so a
    sequential read IS the curriculum. Epoch re-shuffle within phases =
    new seed, no data rewrite."""
    n_phases = len(thresholds) + 1
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    if n_phases > 16:
        raise ValueError(f"at most 16 phases (got {n_phases})")
    if any(b <= a for a, b in zip(thresholds, thresholds[1:])):
        raise ValueError(
            f"thresholds must be strictly ascending (got {thresholds}) — "
            "a duplicate threshold makes its phase unreachable"
        )
    from .packing import exclusive_cumsum

    # NULL difficulty meets no threshold -> phase 0 (scheduled first,
    # like any other easiest-band row) instead of a NULL phase that
    # would poison the order key and the cumsum bucketing.
    phase = F.lit(0)
    for t in thresholds:
        phase = phase + F.coalesce(
            (F.col(difficulty_col) >= F.lit(t)).cast("int"), F.lit(0)
        )
    sort_phase = phase if easy_first else F.lit(n_phases - 1) - phase
    key = F.concat(F.lower(F.hex(sort_phase)), shuffle_key(id_col, seed))
    keyed = (
        df.withColumn(phase_col, phase)
        .withColumn(key_col, key)
        .withColumn("_one", F.lit(1))
    )
    return (
        exclusive_cumsum(keyed, key_col, "_one", out_col=step_col, bucket_prefix_len=3)
        .drop("_one")
        .repartitionByRange(F.col(key_col))
        .sortWithinPartitions(key_col)
    )
