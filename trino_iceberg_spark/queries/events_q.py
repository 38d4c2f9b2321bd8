"""Event-analytics queries over the ``events`` table: funnels, retention
cohorts, per-window leaders, error-rate monitoring.

These are the batch product-analytics shapes a lakehouse serves daily at
100 TB of events: all are single-scan groupBy/window compositions whose
only shuffles are keyed by (user_id) or (window bucket) — never by raw
event row. Conditional aggregation (min-of-filtered-ts) replaces
self-joins for funnel step ordering: one shuffle instead of three.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.testdata import load_table, work_dir
from .registry import register


@register(
    "ev01_funnel",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT COUNT(t_view) AS viewed,
           COUNT(CASE WHEN t_click > t_view THEN 1 END) AS clicked_after_view,
           COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END)
             AS purchased_after_click
    FROM per_user
    """,
)
def ev01_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel with strict time ordering.

    One groupBy(user_id) computes each user's first occurrence of every
    step (conditional MIN) — the classic three-way self-join funnel
    collapsed into a single shuffle."""
    ev = load_table(spark, sf_dir, "events")
    first = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    per_user = ev.groupBy("user_id").agg(
        first("view").alias("t_view"),
        first("click").alias("t_click"),
        first("purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("t_view").alias("viewed"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias(
            "clicked_after_view"
        ),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("purchased_after_click"),
    )


@register(
    "ev02_retention_cohorts",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_date FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_date,
               date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) AS day_offset
        FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT cohort_date, day_offset, COUNT(*) AS active_users
    FROM activity WHERE day_offset IN (0, 1, 7)
    GROUP BY cohort_date, day_offset
    ORDER BY cohort_date, day_offset
    """,
)
def ev02_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D0/D1/D7 retention by signup-day cohort. The first-seen aggregate is
    user-count-sized and broadcasts back onto the event scan, so the big
    table is shuffled once (the per-user MIN), never by event row."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_date")
    )
    activity = (
        ev.join(F.broadcast(first_seen), "user_id")
        .select(
            "user_id",
            "cohort_date",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_date")).alias(
                "day_offset"
            ),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset").isin(0, 1, 7))
        .groupBy("cohort_date", "day_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_date", "day_offset")
    )


@register(
    "ev03_daily_top_users",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, user_id, COUNT(*) AS events
        FROM events GROUP BY day, user_id
    ),
    ranked AS (
        SELECT day, user_id, events,
               CAST(ROW_NUMBER() OVER (PARTITION BY day
                    ORDER BY events DESC, user_id) AS INTEGER) AS rnk
        FROM daily
    )
    SELECT day, user_id, events, rnk FROM ranked WHERE rnk <= 3
    ORDER BY day, rnk
    """,
)
def ev03_daily_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most active users per day — rank-limited window over the
    daily aggregate (WindowGroupLimit prunes before the final sort)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"), F.col("user_id")
    ).agg(F.count(F.lit(1)).alias("events"))
    w = W.partitionBy("day").orderBy(F.col("events").desc(), F.col("user_id"))
    return (
        daily.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .orderBy("day", "rnk")
    )


@register(
    "ev04_error_rate_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour,
           COUNT(*) AS total,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS errors,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS DOUBLE)
             / COUNT(*) AS error_rate
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12'
    GROUP BY hour ORDER BY hour
    """,
)
def ev04_error_rate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly error-rate monitoring over a two-day slice — the ts range
    predicate pushes to the scan; integer-count division keeps the rate
    deterministic (no float aggregation)."""
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-12").cast("timestamp"))
    )
    errors = F.count(F.when(F.col("event_type") == "error", 1))
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("total"),
            errors.alias("errors"),
            (errors.cast("double") / F.count(F.lit(1))).alias("error_rate"),
        )
        .orderBy("hour")
    )


@register(
    "ev05_props_value_stats",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum,
           CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS k_max
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def ev05_props_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction + integer aggregation — get_json_object
    runs map-side before the 5-group shuffle (exact: integer sums)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(k).cast("long").alias("k_sum"),
            F.max(k).cast("int").alias("k_max"),
        )
        .orderBy("event_type")
    )


@register(
    "ev06_hourly_gap_fill",
    oracle="""
    WITH spine AS (
        SELECT unnest(generate_series(
            (SELECT date_trunc('hour', MIN(ts)) FROM events),
            (SELECT date_trunc('hour', MAX(ts)) FROM events),
            INTERVAL 1 HOUR)) AS bucket
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    actual AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               COUNT(*) AS n_events,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                     / COUNT(value), 6) AS avg_value
        FROM events GROUP BY 1, 2
    )
    SELECT g.event_type, g.bucket,
           COALESCE(a.n_events, 0) AS n_events,
           last_value(a.avg_value IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.bucket) AS avg_value_locf
    FROM (SELECT t.event_type, s.bucket FROM types t CROSS JOIN spine s) g
    LEFT JOIN actual a ON a.event_type = g.event_type AND a.bucket = g.bucket
    ORDER BY g.event_type, g.bucket
    """,
)
def ev06_hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample per event type
    (operators.timeseries.gap_fill): dense spine × broadcast group roster,
    zero-filled counts, LOCF-carried average value. The fact table is
    pre-aggregated so the grid join carries one row per cell."""
    from ..operators.timeseries import gap_fill
    from .compat import davg_col

    ev = load_table(spark, sf_dir, "events")
    out = gap_fill(
        ev,
        "ts",
        ["event_type"],
        {
            "n_events": F.count(F.lit(1)),
            "avg_value_locf": F.round(davg_col("value"), 6),
        },
        unit="hour",
        fill_zero=["n_events"],
        locf=["avg_value_locf"],
    )
    return out.select("event_type", "bucket", "n_events", "avg_value_locf").orderBy(
        "event_type", "bucket"
    )


@register(
    "ev07_value_outliers",
    oracle="""
    WITH stats AS (
        SELECT event_type, COUNT(value) AS n,
               SUM(CAST(value AS DECIMAL(18,4))) AS s1,
               SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS s2
        FROM events GROUP BY event_type
    ),
    ms AS (SELECT event_type, n, s2, CAST(s1 AS DOUBLE) / n AS mean FROM stats),
    sd AS (
        SELECT event_type, mean,
               sqrt((CAST(s2 AS DOUBLE) - mean * mean * n) / (n - 1)) AS std
        FROM ms
    )
    SELECT e.event_id, e.event_type,
           ROUND((e.value - s.mean) / s.std, 6) AS zscore
    FROM events e JOIN sd s USING (event_type)
    WHERE ABS((e.value - s.mean) / s.std) > 3.0
    ORDER BY e.event_id
    """,
)
def ev07_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomalies |z| > 3
    (operators.profiling.group_zscore_outliers): exact decimal moments,
    double arithmetic in oracle-identical order, broadcast stats join —
    the scoring pass is map-side only."""
    from ..operators.profiling import group_zscore_outliers

    ev = load_table(spark, sf_dir, "events")
    out = group_zscore_outliers(ev, "value", ["event_type"], z_threshold=3.0)
    return out.select(
        "event_id", "event_type", F.round("zscore", 6).alias("zscore")
    ).orderBy("event_id")


@register(
    "ev08_hypertable_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           COUNT(*) AS cnt,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS value_sum,
           MIN(value) AS value_min, MAX(value) AS value_max
    FROM events
    GROUP BY bucket, event_type
    ORDER BY bucket, event_type
    """,
)
def ev08_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup read path (operators.timeseries.hourly_rollup /
    rollup_with_tail): history served from the pre-aggregated hourly
    rollup, the tail past the cutoff aggregated from raw — and the
    combined result must be bucket-for-bucket identical to aggregating
    raw events over the whole range, which is exactly what the oracle
    computes. Mergeable decimal summaries keep the seam exact."""
    from ..operators.timeseries import hourly_rollup, rollup_with_tail

    e = load_table(spark, sf_dir, "events")
    cutoff = "2024-01-20 00:00:00"
    rollup = hourly_rollup(e.filter(F.col("ts") < F.lit(cutoff).cast("timestamp")))
    combined = rollup_with_tail(rollup, e, cutoff)
    return combined.select(
        "bucket",
        "event_type",
        "cnt",
        F.col("value_sum").cast("double").alias("value_sum"),
        "value_min",
        "value_max",
    ).orderBy("bucket", "event_type")


@register(
    "ev09_sketch_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, event_type,
           COUNT(*) AS cnt,
           COUNT(DISTINCT user_id) AS exact_distinct
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def ev09_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count rollup cascade (operators.timeseries.
    sketch_rollup → merge_sketch_rollup → sketch_estimate): hourly HLL
    sketches of distinct users per event_type, UNIONED up to daily cells
    without touching raw data — the only way COUNT(DISTINCT) cascades in
    a rollup hierarchy. The HLL estimate has no DuckDB twin, so the
    hash-checked OUTPUT is the cascade's cell grid plus the exact
    distinct count, while the sketch path is verified inline: the HLL
    estimate per cell must stay within 15% relative error of the exact
    count (checked inline here, a11-style), and is additionally error-bound
    pinned in tests/test_operators.py."""
    from ..operators.timeseries import merge_sketch_rollup, sketch_estimate, sketch_rollup

    e = load_table(spark, sf_dir, "events")
    hourly = sketch_rollup(e, "ts", ("event_type",), "user_id", "hour")
    daily = merge_sketch_rollup(hourly, "day", ("event_type",))
    est = sketch_estimate(daily).select("bucket", "event_type", "cnt", "approx_distinct")
    exact = e.groupBy(
        F.date_trunc("day", "ts").alias("bucket"), "event_type"
    ).agg(F.countDistinct("user_id").alias("exact_distinct"))
    # Null-safe merge: a NULL event_type cell is produced by BOTH
    # aggregates and must survive (name-list joins are null-unsafe).
    # Explicit side aliases: both frames derive from `events`, so
    # qualified references keep the join unambiguous by construction.
    joined = est.alias("l").join(
        exact.alias("r"),
        F.col("l.bucket").eqNullSafe(F.col("r.bucket"))
        & F.col("l.event_type").eqNullSafe(F.col("r.event_type")),
    ).select(
        F.col("l.bucket"),
        F.col("l.event_type"),
        "cnt",
        "approx_distinct",
        "exact_distinct",
    )
    # Inline sketch verification: 1-row aggregate, not a per-row collect.
    worst = joined.agg(
        F.max(
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct")
        ).alias("max_rel_err")
    ).first()["max_rel_err"]
    if worst is None or worst >= 0.15:  # explicit raise: survives python -O
        raise RuntimeError(f"HLL rel err {worst}")
    return joined.select("bucket", "event_type", "cnt", "exact_distinct").orderBy(
        "bucket", "event_type"
    )


@register(
    "ev10_kmv_distinct_rollup",
    oracle="""
    WITH hashed AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        FROM events
    ),
    sk AS (
        SELECT bucket, event_type, COUNT(*) AS n_distinct,
               list_sort(list(h)) AS hs
        FROM hashed GROUP BY bucket, event_type
    ),
    cnts AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, event_type, COUNT(*) AS cnt
        FROM events GROUP BY bucket, event_type
    )
    SELECT c.bucket, c.event_type, c.cnt,
           CASE WHEN s.n_distinct < 64 THEN CAST(s.n_distinct AS DOUBLE)
                ELSE 63.0 * 1152921504606846976.0 / CAST(s.hs[64] AS DOUBLE)
           END AS est_distinct
    FROM cnts c JOIN sk s ON c.bucket = s.bucket AND c.event_type = s.event_type
    ORDER BY c.bucket, c.event_type
    """,
)
def ev10_kmv_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable mergeable distinct-count cascade
    (operators.sketches.kmv_rollup → kmv_merge → kmv_estimate): hourly
    K-minimum-values sketches of distinct users per event_type, merged up
    to daily cells without re-reading raw data — the portable twin of
    ev09's HLL cascade. Because the sketch is the k smallest md5-derived
    hashes, the DuckDB oracle reproduces the daily sketch (and therefore
    the exact estimate, bit-for-bit) directly from raw events; equality
    holds because min-k of a union equals min-k of the per-hour min-k
    sets."""
    from ..operators.sketches import kmv_estimate, kmv_merge, kmv_rollup

    e = load_table(spark, sf_dir, "events").withColumn(
        "user_key", F.col("user_id").cast("string")
    )
    hourly = kmv_rollup(e, "ts", ("event_type",), "user_key", "hour", k=64)
    daily = kmv_merge(hourly, "day", ("event_type",), k=64)
    return (
        kmv_estimate(daily, k=64)
        .select("bucket", "event_type", "cnt", "est_distinct")
        .orderBy("bucket", "event_type")
    )


@register(
    "ev11_interpolated_gap_fill",
    oracle="""
    WITH spine AS (
        SELECT unnest(generate_series(
            (SELECT date_trunc('hour', MIN(ts)) FROM events),
            (SELECT date_trunc('hour', MAX(ts)) FROM events),
            INTERVAL 1 HOUR)) AS bucket
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    actual AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                     / COUNT(value), 6) AS avg_value
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT g.event_type, g.bucket, a.avg_value
        FROM (SELECT t.event_type, s.bucket FROM types t CROSS JOIN spine s) g
        LEFT JOIN actual a ON a.event_type = g.event_type AND a.bucket = g.bucket
    ),
    win AS (
        SELECT event_type, bucket, avg_value,
               CAST(epoch(bucket) AS DOUBLE) AS pos,
               last_value(avg_value IGNORE NULLS) OVER back AS pv,
               last_value(CASE WHEN avg_value IS NOT NULL
                               THEN CAST(epoch(bucket) AS DOUBLE) END IGNORE NULLS)
                   OVER back AS pt,
               first_value(avg_value IGNORE NULLS) OVER fwd AS nv,
               first_value(CASE WHEN avg_value IS NOT NULL
                                THEN CAST(epoch(bucket) AS DOUBLE) END IGNORE NULLS)
                   OVER fwd AS nt
        FROM grid
        WINDOW back AS (PARTITION BY event_type ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               fwd AS (PARTITION BY event_type ORDER BY bucket
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, bucket,
           CASE WHEN avg_value IS NOT NULL THEN avg_value
                WHEN pv IS NOT NULL AND nv IS NOT NULL
                THEN pv + (nv - pv) * ((pos - pt) / (nt - pt))
           END AS avg_value_interp
    FROM win ORDER BY event_type, bucket
    """,
)
def ev11_interpolated_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample with LINEAR interpolation
    (operators.timeseries.gap_fill → interpolate_linear) — the
    TimescaleDB `interpolate()` analog: each missing grid cell becomes
    the time-weighted blend of its nearest preceding and following
    observations; leading/trailing gaps stay NULL. Both engines evaluate
    the identical window expressions and blend arithmetic on identical
    doubles, so the oracle is an exact value-hash check."""
    from ..operators.timeseries import gap_fill, interpolate_linear
    from .compat import davg_col

    ev = load_table(spark, sf_dir, "events")
    grid = gap_fill(
        ev, "ts", ["event_type"], {"avg_value": F.round(davg_col("value"), 6)},
        unit="hour",
    )
    out = interpolate_linear(grid, "bucket", ["event_type"], ["avg_value"])
    return out.select(
        "event_type", "bucket", F.col("avg_value").alias("avg_value_interp")
    ).orderBy("event_type", "bucket")


@register(
    "ev12_quantile_sample_rollup",
    oracle="""
    WITH nn AS (SELECT * FROM events WHERE value IS NOT NULL),
    hashed AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, event_type,
               ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h,
               CAST(value AS DOUBLE) AS v
        FROM nn
    ),
    rk AS (
        SELECT bucket, event_type, v,
               ROW_NUMBER() OVER (PARTITION BY bucket, event_type ORDER BY h) AS rn
        FROM hashed
    ),
    sk AS (
        SELECT bucket, event_type, list_sort(list(v)) AS vs, COUNT(*) AS n
        FROM rk WHERE rn <= 64 GROUP BY bucket, event_type
    ),
    cnts AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, event_type,
               COUNT(*) AS cnt
        FROM nn GROUP BY 1, 2
    )
    SELECT c.bucket, c.event_type, c.cnt,
           s.vs[GREATEST(1, CAST(ceil(0.5 * s.n) AS INT))] AS p50_est,
           s.vs[GREATEST(1, CAST(ceil(0.9 * s.n) AS INT))] AS p90_est
    FROM cnts c JOIN sk s ON c.bucket = s.bucket AND c.event_type = s.event_type
    ORDER BY c.bucket, c.event_type
    """,
)
def ev12_quantile_sample_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable mergeable QUANTILE cascade (operators.sketches.
    sample_rollup -> sample_merge -> sample_quantiles): hourly
    bottom-k-by-hash value samples per event_type cascade to daily cells
    without re-reading raw data, then report percentile_disc-style
    p50/p90 over the merged sample. The quantile companion to ev10's KMV
    distinct cascade, built on the same merge identity (bottom-k of a
    union = bottom-k of the per-cell bottom-k sets), which is why the
    DuckDB oracle can replay the DAILY sample directly from raw events
    and match the hourly->daily Spark cascade bit-for-bit — estimates
    included, since the quantile is an actual sampled value, not an
    interpolation."""
    from ..operators.sketches import sample_merge, sample_quantiles, sample_rollup

    e = load_table(spark, sf_dir, "events")
    hourly = sample_rollup(
        e, "ts", ("event_type",), "value", "event_id", "hour", k=64
    )
    daily = sample_merge(hourly, "day", ("event_type",), k=64)
    return (
        sample_quantiles(daily, (0.5, 0.9))
        .select("bucket", "event_type", "cnt", "p50_est", "p90_est")
        .orderBy("bucket", "event_type")
    )


@register(
    "ev13_level_shifts",
    oracle="""
    WITH pb AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
                   AS bucket_avg
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    win AS (
        SELECT bucket, event_type, bucket_avg,
               AVG(bucket_avg) OVER (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS recent_avg,
               AVG(bucket_avg) OVER (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN 11 PRECEDING AND 6 PRECEDING) AS prior_avg,
               COUNT(bucket_avg) OVER (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN 11 PRECEDING AND 6 PRECEDING) AS np
        FROM pb
    )
    SELECT bucket, event_type,
           ROUND(recent_avg, 6) AS recent_avg,
           ROUND(prior_avg, 6) AS prior_avg,
           CASE WHEN np = 6 AND prior_avg <> 0
                THEN ROUND((recent_avg - prior_avg) / ABS(prior_avg), 6)
           END AS rel_change,
           CASE WHEN np = 6 AND prior_avg <> 0
                THEN ABS((recent_avg - prior_avg) / ABS(prior_avg)) > 0.25
           END AS shifted
    FROM win ORDER BY event_type, bucket
    """,
)
def ev13_level_shifts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal level-shift detection (operators.timeseries.level_shifts):
    per event_type, each hour's trailing 6-bucket mean vs the 6 buckets
    before those, flagged when the level moved >25% — windowed
    change-point monitoring, the time-axis companion to pr04's
    distribution drift. Means derive from exact DECIMAL sums; the
    fixed-size window averages are ROUND(6)-gated (DuckDB's segment-tree
    window aggregation associates differently in the last bits)."""
    from ..operators.timeseries import level_shifts

    e = load_table(spark, sf_dir, "events")
    out = level_shifts(
        e, "ts", ("event_type",), "value", "hour", window=6, rel_threshold=0.25
    )
    return out.select(
        "bucket",
        "event_type",
        F.round("recent_avg", 6).alias("recent_avg"),
        F.round("prior_avg", 6).alias("prior_avg"),
        F.round("rel_change", 6).alias("rel_change"),
        "shifted",
    ).orderBy("event_type", "bucket")


@register(
    "ev14_incremental_rollup",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum
    FROM events WHERE event_type <> 'error'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def ev14_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance (operators.timeseries.
    apply_rollup_delta + catalog CDC): an hourly rollup built at snapshot
    v1 is refreshed to the current state by folding in ONLY the
    changelog between v1 and HEAD — one append commit and one DELETE
    later — never re-reading v1's history. The oracle recomputes the
    final-state rollup from scratch; hash-equality proves
    delta-maintained == recomputed, the continuous-aggregate refresh
    contract (signed counts, exact signed DECIMAL sums, zero-count cells
    dropped, new-in-delta cells created)."""
    from ..catalog.snapshots import SnapshotTable
    from ..operators.timeseries import apply_rollup_delta

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    tdir = work_dir("ev14_table")
    table = SnapshotTable(spark, tdir)
    v1 = table.append(e.filter(F.col("event_id") % 2 == 0)).snapshot_id
    base = (
        table.read_version(v1)
        .groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("decimal(38,4)")
            .alias("value_sum"),
        )
    )
    table.append(e.filter(F.col("event_id") % 2 == 1))
    head = table.delete_where(F.col("event_type") == "error").snapshot_id
    delta = table.changelog(v1, head)
    return (
        apply_rollup_delta(base, delta, "ts", ("event_type",), "value")
        # Internals stay exact DECIMAL (order-independent merge); only the
        # OUTPUT boundary is cast to double, matching the ev08/ev10/ev12
        # convention so the driver's value hash is type-stable vs DuckDB.
        .withColumn("value_sum", F.col("value_sum").cast("double"))
        .orderBy("bucket", "event_type")
    )


@register(
    "ev15_bloom_prefilter",
    oracle="""
    WITH ref AS (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'purchase' AND value > 200
    ),
    rpos AS (
        SELECT ('0x' || substr(md5(i::VARCHAR || '|' || user_id::VARCHAR), 1, 15))::BIGINT
               % 65536 AS p
        FROM ref, unnest([0, 1, 2, 3]) AS t(i)
    ),
    words AS (
        SELECT p // 32 AS word, bit_or(1::BIGINT << (p % 32)) AS bits
        FROM rpos GROUP BY 1
    ),
    views AS (SELECT event_id, user_id FROM events WHERE event_type = 'view'),
    vpos AS (
        SELECT v.event_id, v.user_id,
               ('0x' || substr(md5(i::VARCHAR || '|' || v.user_id::VARCHAR), 1, 15))::BIGINT
               % 65536 AS p
        FROM views v, unnest([0, 1, 2, 3]) AS t(i)
    ),
    hits AS (
        -- COALESCE(..., FALSE): two-valued NULL semantics to match the
        -- Spark side — a NULL key probes False (never inserted), and a
        -- NULL key's exact membership is False, not SQL IN's NULL.
        SELECT event_id, user_id,
               COALESCE(bool_and((COALESCE(w.bits, 0) & (1::BIGINT << (p % 32))) <> 0),
                        FALSE) AS bloom_hit
        FROM vpos LEFT JOIN words w ON p // 32 = w.word
        GROUP BY event_id, user_id
    )
    SELECT h.event_id, h.user_id, h.bloom_hit,
           COALESCE(h.user_id IN (SELECT user_id FROM ref), FALSE) AS exact_hit
    FROM hits h ORDER BY event_id
    """,
)
def ev15_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom-filter membership prefilter (operators.sketches.
    bloom_build / bloom_might_contain) — the no-shuffle denylist/
    decontamination gate: the SMALL reference side (high-value
    purchasers) builds a 64 Kbit / k=4 bitmap from md5-derived hashes,
    which broadcasts as ONE 8 KiB row; the big fact side (view events)
    is probed with pure map-side JVM bit arithmetic — the fact table is
    never shuffled or joined, which is the whole point at 100 TB (an
    exact semi-join would shuffle the fact side by key). Both the
    construction AND the probe are engine-portable (32-bit words in
    BIGINT keep every shift representable), so the DuckDB oracle replays
    the bitmap bit-for-bit — false positives included, making the entry
    hash-exact rather than approximate. exact_hit carries the ground
    truth with two-valued NULL semantics (a NULL key is not a member —
    COALESCEd to FALSE on both engines); the inline check pins the Bloom
    contract (no false negatives, ever)."""
    from ..operators.sketches import bloom_build, bloom_might_contain

    e = load_table(spark, sf_dir, "events")
    ref = (
        e.filter((F.col("event_type") == "purchase") & (F.col("value") > 200))
        .select("user_id")
        .distinct()
    )
    bloom = bloom_build(ref, "user_id", m_bits=1 << 16, k=4)
    views = e.filter(F.col("event_type") == "view").select("event_id", "user_id")
    probed = bloom_might_contain(views, "user_id", bloom, m_bits=1 << 16, k=4)
    out = (
        probed.join(
            F.broadcast(ref.withColumn("exact_hit", F.lit(True))), "user_id", "left"
        )
        .withColumn("exact_hit", F.coalesce("exact_hit", F.lit(False)))
        .select("event_id", "user_id", "bloom_hit", "exact_hit")
    )
    # Inline Bloom contract check (1-row aggregate): a real member can
    # never be missed — only extra (false-positive) hits are possible.
    misses = out.filter(F.col("exact_hit") & ~F.col("bloom_hit")).count()
    if misses != 0:  # explicit raise: survives python -O, unlike assert
        raise RuntimeError(f"bloom false negatives: {misses}")
    return out.orderBy("event_id")
