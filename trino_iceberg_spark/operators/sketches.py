"""Approximate/sketch aggregates — the 100 TB substitutes for exact
distinct/quantiles (SURVEY.md §2.C scalar-fn surface; Spark built-ins)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import portable_hash64

__all__ = [
    "approx_distinct",
    "approx_quantiles",
    "frequent_items",
    "kmv_rollup",
    "kmv_merge",
    "kmv_estimate",
    "sample_rollup",
    "sample_merge",
    "sample_quantiles",
    "bloom_build",
    "bloom_might_contain",
]

# portable_hash64 draws uniformly from [0, 2^60) — the KMV estimator's
# normalization constant.
_KMV_SPACE = float(1 << 60)


def approx_distinct(df: DataFrame, col: str, group_by: list[str] | None = None, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct count (approx_count_distinct) — mergeable,
    constant memory; the correct choice when COUNT(DISTINCT) would shuffle
    trillions of keys."""
    agg = F.approx_count_distinct(col, rsd).alias(f"approx_distinct_{col}")
    return df.groupBy(*(group_by or [])).agg(agg)


def approx_quantiles(
    df: DataFrame, col: str, probabilities: list[float], accuracy: int = 10000,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Greenwald-Khanna approximate percentiles (percentile_approx)."""
    agg = F.percentile_approx(
        col, [F.lit(p) for p in probabilities], F.lit(accuracy)
    ).alias(f"quantiles_{col}")
    return df.groupBy(*(group_by or [])).agg(agg)


def frequent_items(df: DataFrame, col: str, support: float = 0.01) -> DataFrame:
    """Heavy hitters via Karp et al. frequent-items sketch (freqItems)."""
    return df.freqItems([col], support)


def kmv_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    dims: tuple[str, ...] = ("event_type",),
    key_col: str = "user_id",
    granularity: str = "hour",
    k: int = 64,
) -> DataFrame:
    """Continuous aggregate with a K-MINIMUM-VALUES distinct sketch
    (Bar-Yossef et al. 2002): each (bucket × dims) cell keeps the ``k``
    smallest :func:`~..operators.dedup.portable_hash64` values of
    ``key_col`` plus the exact row count.

    The engine-portable twin of the HLL cascade in
    :mod:`..operators.timeseries`: KMV on a deterministic md5-derived
    hash makes the sketch AND its estimate bit-reproducible by any engine
    (the ev10 registry entry's DuckDB oracle replays the whole cascade),
    where DataSketches HLL estimates only Spark can produce. Error is
    ~1/√(k−2) relative (k=64 → ~8%); HLL remains the byte-efficiency
    choice.

    Scale shape: distinct (cell, hash) pairs shuffle once, a per-cell
    rank window keeps the k smallest (bounded state per cell — no
    collect of full member sets), and the row count rides a standard
    partial-aggregated groupBy on the same keys."""
    bucket = F.date_trunc(granularity, F.col(ts_col)).alias("bucket")
    dim_cols = [F.col(d) for d in dims]
    keys = ["bucket", *dims]
    hashed = events.select(
        bucket, *dim_cols, portable_hash64(F.col(key_col)).alias("_h")
    ).distinct()
    rn = F.row_number().over(Window.partitionBy(*keys).orderBy("_h"))
    topk = hashed.withColumn("_rn", rn).filter(F.col("_rn") <= k)
    sketches = topk.groupBy(*keys).agg(
        F.array_sort(F.collect_list("_h")).alias("kmv")
    )
    counts = events.groupBy(bucket, *dim_cols).agg(F.count(F.lit(1)).alias("cnt"))
    # Null-safe equi-join: a cell whose dimension value is NULL was computed
    # by BOTH aggregates (groupBy keeps NULL keys) and must survive the
    # merge — a plain inner join would silently drop it. Both sides derive
    # from `events`, so alias them explicitly: qualified F.col references
    # make the join unambiguous by construction instead of leaning on
    # Spark's dataframe-id disambiguation heuristic (which logs a
    # "trivially true equals predicate" warning).
    cond = None
    for c in keys:
        term = F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}"))
        cond = term if cond is None else (cond & term)
    return counts.alias("l").join(sketches.alias("r"), cond).select(
        F.col("l.bucket"), *[F.col(f"l.{d}") for d in dims], "cnt", "kmv"
    )


def kmv_merge(
    rollup: DataFrame,
    to_granularity: str = "day",
    dims: tuple[str, ...] = ("event_type",),
    k: int = 64,
) -> DataFrame:
    """Cascade a KMV rollup to a coarser granularity without touching raw
    data: the k smallest of the union of per-cell k-smallest sets IS the
    k smallest of the union (any value in the coarser cell's top-k is in
    its own finer cell's top-k — fewer than k values anywhere are below
    it), so the cascade is exactly equal to computing the sketch from raw.
    Each merge input is ≤ k values, so the flatten is bounded."""
    bucket = F.date_trunc(to_granularity, F.col("bucket")).alias("bucket")
    merged = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmv")))), 1, k
    )
    return rollup.groupBy(bucket, *[F.col(d) for d in dims]).agg(
        merged.alias("kmv"), F.sum("cnt").alias("cnt")
    )


def kmv_estimate(rollup: DataFrame, k: int = 64) -> DataFrame:
    """Replace the sketch column with its distinct-count estimate:
    exact |sketch| when the cell never filled (fewer than k distinct
    keys — the sketch IS the distinct hash set), else the KMV estimator
    (k−1)·SPACE/kth_min. Pure double arithmetic in a fixed op order, so
    any engine reproduces the exact same IEEE value."""
    size = F.size("kmv")
    kth = F.element_at("kmv", k).cast("double")
    est = F.when(size < k, size.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / kth
    )
    return rollup.withColumn("est_distinct", est).drop("kmv")


def sample_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    dims: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    id_col: str = "event_id",
    granularity: str = "hour",
    k: int = 64,
) -> DataFrame:
    """Continuous aggregate with a mergeable BOTTOM-K-BY-HASH value sample
    (bottom-k sketches, Cohen & Kaplan 2007): each (bucket × dims) cell
    keeps the ``(hash, value)`` pairs for the ``k`` rows whose
    :func:`~..operators.dedup.portable_hash64` of ``id_col`` is smallest,
    plus the exact non-null row count. Because the hash order is a fixed
    random-but-deterministic permutation of the rows, the retained values
    are a uniform sample of the cell — and the same merge identity that
    makes KMV cascade exactly (bottom-k of a union = bottom-k of the
    per-cell bottom-k sets) makes this sample cascade exactly, so
    coarser-grained quantile estimates never re-read raw data.

    This is the quantile companion to :func:`kmv_rollup`: KMV answers
    "how many distinct", this answers "what does the value distribution
    look like" from the same O(k) state per cell, bit-reproducible by any
    engine (the ev12 registry entry's DuckDB oracle replays the cascade),
    where t-digest/KLL sketches are library-specific bytes.

    Scale shape (round 16): ONE scan, one shuffle of (cell, hash, value)
    rows — the per-cell ``cnt`` is an unbounded-frame window count
    sharing the rank window's partitioning+sort, so both ride the same
    Window operator; the pre-r16 form scanned raw events a second time
    for a partial-aggregated count and null-safe-joined it back, i.e.
    two full passes + a join for a value the window pass already knows.
    Unlike :func:`kmv_rollup` (whose count is over RAW rows while its
    sketch is over DISTINCT hashes, so the two aggregates genuinely need
    different inputs), the sample's count is over exactly the rows the
    window ranks — the fusion is identity-preserving. NULL values are
    excluded from both the sample and ``cnt`` (the estimate is a
    quantile of observed values); NULL-valued dimension cells survive
    because groupBy keeps NULL keys (no join left to drop them)."""
    bucket = F.date_trunc(granularity, F.col(ts_col)).alias("bucket")
    dim_cols = [F.col(d) for d in dims]
    keys = ["bucket", *dims]
    nn = events.filter(F.col(value_col).isNotNull())
    hashed = nn.select(
        bucket,
        *dim_cols,
        portable_hash64(F.col(id_col).cast("string")).alias("_h"),
        F.col(value_col).cast("double").alias("_v"),
    )
    w = Window.partitionBy(*keys).orderBy("_h")
    rn = F.row_number().over(w)
    cnt = F.count(F.lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    topk = (
        hashed.withColumn("_rn", rn)
        .withColumn("_cnt", cnt)
        .filter(F.col("_rn") <= k)
    )
    return topk.groupBy(*keys).agg(
        F.first("_cnt").alias("cnt"),
        F.array_sort(F.collect_list(F.struct("_h", "_v"))).alias("smp"),
    ).select("bucket", *dims, "cnt", "smp")


def sample_merge(
    rollup: DataFrame,
    to_granularity: str = "day",
    dims: tuple[str, ...] = ("event_type",),
    k: int = 64,
) -> DataFrame:
    """Cascade a bottom-k sample rollup to a coarser granularity without
    touching raw data: any pair in the coarser cell's hash-bottom-k is in
    its own finer cell's bottom-k, so re-taking the k hash-smallest of
    the union reproduces EXACTLY the sample a raw-data rollup at the
    coarse granularity would keep. array_sort on (hash, value) structs
    orders by hash first; each merge input is ≤ k pairs, so the flatten
    is bounded at fan-in × k."""
    bucket = F.date_trunc(to_granularity, F.col("bucket")).alias("bucket")
    merged = F.slice(F.array_sort(F.flatten(F.collect_list("smp"))), 1, k)
    return rollup.groupBy(bucket, *[F.col(d) for d in dims]).agg(
        merged.alias("smp"), F.sum("cnt").alias("cnt")
    )


def sample_quantiles(
    rollup: DataFrame, quantiles: tuple[float, ...] = (0.5, 0.9)
) -> DataFrame:
    """Replace the sample column with discrete quantile estimates: for
    each q, the ``ceil(q·n)``-th smallest sampled VALUE (percentile_disc
    semantics over the sample — an actual observed value, no
    interpolation, so the result is exact IEEE-comparable across
    engines). Cells that never filled their k slots hold the whole cell,
    making small-cell estimates exact."""
    vals = F.array_sort(F.transform(F.col("smp"), lambda s: s["_v"]))
    out = rollup.withColumn("_vals", vals).withColumn("_n", F.size("_vals"))
    for q in quantiles:
        idx = F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("_n")).cast("int"))
        out = out.withColumn(f"p{int(round(q * 100))}_est", F.element_at("_vals", idx))
    return out.drop("smp", "_vals", "_n")


# -- portable Bloom filter ---------------------------------------------------
#
# Membership prefilter for decontamination / denylist gates: the SMALL
# reference key set becomes a bitmap that broadcasts as ONE row, and the
# big fact side is probed with pure JVM bit arithmetic — the fact table is
# never shuffled or joined. Words are 32 bits stored in BIGINT so every
# shift stays far from the sign bit: both Spark and DuckDB evaluate
# 1::BIGINT << 31 without overflow, keeping the whole construction (and
# its false positives) bit-reproducible by any engine — the same
# portability contract as kmv_rollup. (DuckDB rejects 1::BIGINT << 63,
# so 64-bit words would NOT be replayable.)

_BLOOM_WORD = 32


def _bit_value(bit: Column) -> Column:
    """2**bit as BIGINT for bit in [0, 32) — a literal power table indexed
    by the (computed) bit position, because pyspark's shiftleft only takes
    a Python int for the shift amount."""
    powers = F.array(*[F.lit(1 << b).cast("bigint") for b in range(_BLOOM_WORD)])
    return F.element_at(powers, bit.cast("int") + F.lit(1))


def _bloom_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k md5-derived bit positions in [0, m_bits) for one key — hash i is
    portable_hash64 of 'i|' || key, so any engine replays the family."""
    return [
        F.pmod(
            portable_hash64(F.concat(F.lit(f"{i}|"), key.cast("string"))),
            F.lit(m_bits),
        )
        for i in range(k)
    ]


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 4
) -> DataFrame:
    """ONE-row DataFrame holding a dense Bloom bitmap (``bloom``:
    array<bigint> of ``m_bits / 32`` 32-bit words) over ``keys.key_col``.

    Scale shape: k positions per key explode map-side, one groupBy(word)
    over at most m_bits/32 groups, then a single-row assembly — the only
    data that ever reaches the driver-adjacent stage is the bitmap itself
    (m_bits/8 bytes; 8 KiB at the default 64 Kbit), which is exactly what
    makes it broadcastable to every executor.

    NULL keys are dropped: a NULL contributes no membership information
    (its k hash positions are all NULL, which would otherwise surface as
    a NULL map key at assembly), matching the two-valued NULL semantics
    of :func:`bloom_might_contain`."""
    n_words = m_bits // _BLOOM_WORD
    pos = keys.filter(F.col(key_col).isNotNull()).select(
        F.explode(F.array(*_bloom_positions(F.col(key_col), m_bits, k))).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / _BLOOM_WORD).cast("int").alias("word"),
            _bit_value(F.pmod(F.col("pos"), F.lit(_BLOOM_WORD))).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("_m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0).cast("bigint")),
        ).alias("bloom")
    )


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 16,
    k: int = 4,
    result_col: str = "bloom_hit",
) -> DataFrame:
    """``df`` plus a boolean ``result_col``: True iff all k bits for
    ``key_col`` are set in the (broadcast, 1-row) ``bloom`` bitmap.

    False negatives are impossible (every inserted key set all its bits);
    false positives are deterministic and engine-reproducible. The probe
    is pure map-side column arithmetic on the broadcast row — ``df`` is
    never shuffled, the property that makes this the 100 TB pre-gate in
    front of an exact (join-based) membership check.

    NULL-key semantics are two-valued: a NULL key probes False (it was
    never inserted — :func:`bloom_build` drops NULLs), NOT the
    three-valued NULL that SQL ``IN (subquery)`` would yield. A caller
    composing this with an exact IN-style check must align the two (the
    ev15 registry entry does, on both the Spark and oracle sides)."""
    out = df.crossJoin(F.broadcast(bloom))  # 1-row bitmap: broadcast by design
    cond = None
    for pos in _bloom_positions(F.col(key_col), m_bits, k):
        word = F.element_at(
            F.col("bloom"), (pos / _BLOOM_WORD).cast("int") + F.lit(1)
        )
        bit = _bit_value(F.pmod(pos, F.lit(_BLOOM_WORD)))
        t = word.bitwiseAND(bit) != 0
        cond = t if cond is None else (cond & t)
    hit = F.when(F.col(key_col).isNull(), F.lit(False)).otherwise(cond)
    return out.withColumn(result_col, hit).drop("bloom")
