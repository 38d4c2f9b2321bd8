"""One-pass data profiling — per-column health stats for lake tables.

The everyday lakehouse utility: null rates, cardinalities, and ranges for
every column of a table, computed in ONE scan (a single wide aggregate —
Spark evaluates all column stats in the same partial/final aggregation),
then unpivoted to long format. No per-column jobs, no driver loops: the
cost is one pass regardless of column count.

``exact`` toggles COUNT(DISTINCT) (one expand per column — exact, heavier
shuffle) vs ``approx_count_distinct`` (HLL, one pass, ~2% error) — the
100 TB default is approximate; the correctness gate pins the exact form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "profile_columns",
    "group_zscore_outliers",
    "column_correlations",
    "expectations_report",
    "psi_report",
    "calibration_bins",
]


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """Long-format profile: one row per column with
    (n_rows, n_nulls, n_distinct, min_value, max_value) — min/max cast to
    string so heterogeneous column types share one schema."""
    names = cols or df.columns
    aggs: list = [F.count(F.lit(1)).alias("_n")]
    for c in names:
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"_nulls_{c}"))
        if exact:
            aggs.append(F.count_distinct(col).alias(f"_dist_{c}"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"_dist_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"_max_{c}"))
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"_nulls_{c}").alias("n_nulls"),
            F.col(f"_dist_{c}").alias("n_distinct"),
            F.col(f"_min_{c}").alias("min_value"),
            F.col(f"_max_{c}").alias("max_value"),
        )
        for c in names
    ]
    return (
        wide.select(F.explode(F.array(*per_col)).alias("p"))
        .select("p.*")
        .orderBy("column")
    )


def group_zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Rows whose ``value_col`` deviates more than ``z_threshold`` standard
    deviations from their group mean, with the z-score attached.

    Moments come from exact DECIMAL sums (sum x, sum x² — order-independent
    across partitions, unlike double accumulation), converted to double
    only for the final mean/variance arithmetic; the per-row z-score is
    then a map-side expression against the broadcast per-group stats. Two
    passes over the data by necessity (mean before deviation), one small
    shuffle for the group moments, zero for the scoring join when the
    group roster fits the broadcast threshold.
    """
    v = F.col(value_col).cast("decimal(18,4)")
    stats = df.groupBy(*group_cols).agg(
        F.count(value_col).alias("_n"),
        F.sum(v).alias("_s1"),
        F.sum(v * v).alias("_s2"),
    )
    mean = (F.col("_s1").cast("double") / F.col("_n")).alias("_mean")
    stats = stats.select(*group_cols, "_n", "_s2", mean)
    var = (F.col("_s2").cast("double") - F.col("_mean") * F.col("_mean") * F.col("_n")) / (
        F.col("_n") - 1
    )
    stats = stats.select(*group_cols, "_mean", F.sqrt(var).alias("_std"))
    # constant groups (std = 0) have no outliers by definition; guard the
    # division so ANSI mode doesn't throw on them
    z = F.when(
        F.col("_std") > 0, (F.col(value_col) - F.col("_mean")) / F.col("_std")
    )
    return (
        df.join(F.broadcast(stats), group_cols)
        .withColumn("zscore", z)
        .where(F.abs(F.col("zscore")) > z_threshold)
        .drop("_mean", "_std")
    )


def column_correlations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations for ``cols`` in ONE aggregation pass.

    All sums (Σx, Σx², Σxy for every pair) evaluate inside a single wide
    partial/final aggregate — one scan, one 1-row shuffle, regardless of
    pair count — then the 1-row result unpivots to (col_a, col_b, corr).
    Sums are exact DECIMALs (order-independent across partitions); the
    correlation arithmetic runs in double with a fixed operation order so
    any engine computing the same formula gets bit-identical results.
    """
    # Pairwise-complete semantics: every sum for pair (a, b) — including
    # Σa, Σa², n — is taken over rows where BOTH a and b are non-null, so a
    # NULL in one column cannot skew another pair's statistics (and n always
    # counts exactly the rows the sums cover).
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    aggs = []
    for a, b in pairs:
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        k = f"{a}_{b}"
        aggs.append(F.sum(F.when(both, F.lit(1)).otherwise(F.lit(0))).alias(f"_n_{k}"))
        aggs.append(F.sum(F.when(both, dec(a))).alias(f"_sa_{k}"))
        aggs.append(F.sum(F.when(both, dec(b))).alias(f"_sb_{k}"))
        aggs.append(F.sum(F.when(both, dec(a) * dec(a))).alias(f"_paa_{k}"))
        aggs.append(F.sum(F.when(both, dec(a) * dec(b))).alias(f"_pab_{k}"))
        aggs.append(F.sum(F.when(both, dec(b) * dec(b))).alias(f"_pbb_{k}"))
    row = df.agg(*aggs)

    def corr(a: str, b: str):
        k = f"{a}_{b}"
        n = F.col(f"_n_{k}")
        sa, sb = F.col(f"_sa_{k}").cast("double"), F.col(f"_sb_{k}").cast("double")
        sab = F.col(f"_pab_{k}").cast("double")
        saa = F.col(f"_paa_{k}").cast("double")
        sbb = F.col(f"_pbb_{k}").cast("double")
        num = n * sab - sa * sb
        den = F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
        return F.when(den > 0, num / den)

    structs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"), F.lit(b).alias("col_b"), corr(a, b).alias("corr")
            )
            for a, b in pairs
        ]
    )
    return row.select(F.explode(structs).alias("_e")).select("_e.*")


def expectations_report(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Declarative data-quality gate (the Deequ/Great-Expectations shape,
    engine-native): evaluate every rule in ONE wide aggregate over a single
    scan and return one row per rule —
    ``(rule, column, violations, total, passed)``.

    Supported rules:
      ("not_null", col)            — col IS NULL counts as a violation
      ("unique", col)              — duplicated values (count - distinct)
      ("range", col, lo, hi)       — non-null values outside [lo, hi]
      ("in_set", col, values)      — non-null values not in the set
      ("matches", col, regex)      — non-null values not matching

    Scale shape: every rule compiles to a conditional-count expression in
    the same aggregate, so the whole report is one scan + a 1-row reduce
    regardless of rule count ("unique" adds a count-distinct expansion on
    its column — still partial-aggregated map-side). No rule loops over
    the data separately; adding a rule adds an expression, not a pass."""
    aggs = [F.count(F.lit(1)).alias("_total")]
    meta: list[tuple[str, str]] = []
    for i, rule in enumerate(rules):
        kind, col = rule[0], rule[1]
        c = F.col(col)
        if kind == "not_null":
            viol = F.count_if(c.isNull())
        elif kind == "unique":
            viol = F.count(c) - F.count_distinct(c)
        elif kind == "range":
            lo, hi = rule[2], rule[3]
            viol = F.count_if(c.isNotNull() & ~c.between(lo, hi))
        elif kind == "in_set":
            viol = F.count_if(c.isNotNull() & ~c.isin(list(rule[2])))
        elif kind == "matches":
            viol = F.count_if(c.isNotNull() & ~c.rlike(rule[2]))
        else:
            raise ValueError(f"unknown expectation rule {kind!r}")
        aggs.append(viol.cast("long").alias(f"_v{i}"))
        meta.append((kind, col))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{kind}', '{col}', _v{i}" for i, (kind, col) in enumerate(meta)
    )
    return wide.selectExpr(
        f"stack({len(meta)}, {stack_args}) AS (rule, column, violations)", "_total"
    ).select(
        "rule",
        "column",
        "violations",
        F.col("_total").cast("long").alias("total"),
        (F.col("violations") == 0).alias("passed"),
    )


def psi_report(
    reference: DataFrame,
    current: DataFrame,
    value_col: str,
    group_by: list[str] | None = None,
    bins: int = 10,
    epsilon: float = 1e-6,
) -> DataFrame:
    """Population Stability Index drift report between a reference corpus
    snapshot and the current one — the standard train/serve and
    ingest-batch drift gate (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25
    shifted). Bins are ``bins`` equal-width cuts of the REFERENCE
    per-group [min, max] (fixed, data-independent given the reference —
    unlike quantile bins, two runs always agree); out-of-range current
    values clamp into the edge bins, and ``epsilon`` floors empty-bin
    shares so the log stays finite (the convention that makes PSI defined
    when a bin dies out entirely).

    Returns one row per group: ``(group..., psi, n_ref, n_cur)`` with
    ``psi = Σ (q_i − p_i) · ln(q_i / p_i)``.

    Scale shape: per-group (min, max, count) is one tiny aggregate
    broadcast back; binning is a map-side expression; each side then
    aggregates (group, bin) counts — two scans, two small shuffles, no
    driver-side data. NULL values are excluded (drift is over observed
    values), and groups with no reference presence are dropped — PSI is
    undefined without a reference distribution; detect NEW groups with a
    set difference upstream."""
    keys = list(group_by or [])
    v = F.col(value_col)
    ref = reference.filter(v.isNotNull())
    cur = current.filter(v.isNotNull())
    stats = ref.groupBy(*keys).agg(
        F.min(v).cast("double").alias("_lo"),
        F.max(v).cast("double").alias("_hi"),
        F.count(F.lit(1)).alias("n_ref"),
    )

    def binned(df, n_col):
        j = df.join(F.broadcast(stats.select(*keys, "_lo", "_hi")), keys) if keys else (
            df.crossJoin(F.broadcast(stats.select("_lo", "_hi")))
        )
        width = (F.col("_hi") - F.col("_lo")) / F.lit(float(bins))
        raw = F.floor((v.cast("double") - F.col("_lo")) / width).cast("int")
        b = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
            F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw))
        )
        return j.withColumn("_bin", b).groupBy(*keys, "_bin").agg(
            F.count(F.lit(1)).alias(n_col)
        )

    rb = binned(ref, "_nr")
    cb = binned(cur, "_nc")
    grid = rb.join(cb, [*keys, "_bin"], "full")
    totals_cur = cur.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_cur"))
    joined = (
        grid.join(stats.select(*keys, "n_ref"), keys)
        .join(totals_cur, keys)
        if keys
        else grid.crossJoin(F.broadcast(stats.select("n_ref"))).crossJoin(
            F.broadcast(totals_cur)
        )
    )
    p = F.greatest(
        F.lit(epsilon), F.coalesce(F.col("_nr"), F.lit(0)) / F.col("n_ref")
    )
    q = F.greatest(
        F.lit(epsilon), F.coalesce(F.col("_nc"), F.lit(0)) / F.col("n_cur")
    )
    term = (q - p) * F.log(q / p)
    return joined.groupBy(*keys, "n_ref", "n_cur").agg(
        F.round(F.sum(term), 6).alias("psi")
    ).select(*keys, "psi", "n_ref", "n_cur")


def calibration_bins(
    df: DataFrame,
    score_col: str,
    outcome_col: str,
    bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Reliability-diagram bins for a score against a binary outcome —
    the calibration evidence behind every score-thresholded curation
    gate (Guo et al. 2017, "On Calibration of Modern Neural Networks"):
    if documents scored ~0.8 aren't ~80% positive, the cu09-style budget
    threshold selects the wrong corpus slice. ``bins`` equal-width cuts
    of the FIXED [lo, hi) score range (data-independent, so two runs and
    two engines always agree — same policy as :func:`psi_report`);
    out-of-range scores clamp into the edge bins.

    Returns one row per non-empty bin: ``(bin, bin_lo, bin_hi, n,
    n_positive, positive_rate)``. The per-bin |positive_rate − bin
    midpoint| gaps aggregate to ECE downstream; kept per-bin here
    because the diagram, not the scalar, is what a curation review
    actually reads.

    Rows with a NULL/NaN score or a NULL outcome are EXCLUDED — a
    calibration diagram is defined over labeled, scored rows only
    (counting unlabeled rows as negatives would deflate every bin's
    positive_rate and report miscalibration that is really missing
    labels).

    Scale shape: one map-side bin expression + one groupBy(bin)
    aggregate with map-side combine — a single scan, one bins-sized
    shuffle. Outcome accounting is integer (SUM of 0/1), so the rate is
    one exact IEEE division per emitted row — engine-replayable."""
    if bins <= 0:
        raise ValueError(f"bins must be positive (got {bins})")
    if not hi > lo:
        raise ValueError(f"need hi > lo (got {lo}, {hi})")
    s = F.col(score_col).cast("double")
    raw = F.floor((s - F.lit(float(lo))) / F.lit(float(hi - lo)) * bins).cast("int")
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))
    y = F.col(outcome_col).cast("boolean")
    pos = F.when(y, 1).otherwise(0)
    width = (hi - lo) / bins
    return (
        df.filter(s.isNotNull() & ~F.isnan(s) & y.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(pos).cast("long").alias("n_positive"),
        )
        .withColumn("bin_lo", F.lit(float(lo)) + F.col("bin") * F.lit(width))
        .withColumn("bin_hi", F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(width))
        .withColumn("positive_rate", F.col("n_positive") / F.col("n"))
        .select("bin", "bin_lo", "bin_hi", "n", "n_positive", "positive_rate")
    )
