"""Time-series regularization: complete time spines, gap-filled resampling,
and last-observation-carried-forward — the operators that turn irregular
event streams into dense, model-ready series.

No reference analog (SURVEY.md §2.C: the reference's surface is plain SQL);
these are north-star pipeline operators. Hypertable-style engines call this
``time_bucket_gapfill`` + ``locf``.

Scale design (100 TB rule):

- The spine is a ``spark.range`` over the bucket count (bounds from a
  one-row, constant-size aggregate collect): distributed and memory-flat
  at any spine length — second-granularity over years is just a longer
  range — where a ``sequence``+``explode`` spine would build the whole
  bucket array inside a single row.
- The group-key roster (``distinct`` over the group columns) is tiny by
  construction (it is the series cardinality) and is broadcast into the
  spine cross join, so grid construction never shuffles the fact table.
- The fact table is aggregated *before* joining the grid — the join
  carries one row per (group, bucket), not per event, and both sides
  share the (bucket, group) key, which AQE coalesces into one exchange.
- LOCF is a per-series window (partition by group, order by bucket) —
  state never crosses series, so skew is bounded by the densest series.
"""

from __future__ import annotations

from typing import Iterable, Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "time_spine",
    "gap_fill",
    "interpolate_linear",
    "hourly_rollup",
    "rollup_with_tail",
    "sketch_rollup",
    "merge_sketch_rollup",
    "sketch_estimate",
    "level_shifts",
    "apply_rollup_delta",
]


def time_spine(df: DataFrame, ts_col: str, unit: str = "hour") -> DataFrame:
    """Dense ``bucket`` column covering [trunc(min ts), trunc(max ts)] at
    1-``unit`` steps (unit: 'day' | 'hour' | 'minute').

    Built on ``spark.range`` over the bucket COUNT, so the spine is
    distributed and memory-flat at any length — a second-granularity
    spine over years is just a longer range split across tasks. (The
    previous ``sequence``+``explode`` construction materialized the whole
    bucket array inside one row, capping practical spines at ~1M
    buckets.) The bounds are a one-row aggregate collected driver-side —
    a constant-size metadata collect, same policy as the centroid/
    codebook collects elsewhere in this repo; ``timestampdiff``/
    ``timestampadd`` keep the calendar-step semantics ``sequence`` with
    an INTERVAL step had."""
    if unit.lower() not in ("day", "hour", "minute"):
        raise ValueError(
            f"time_spine unit must be one of 'day'|'hour'|'minute', got {unit!r}"
        )
    u = unit.upper()
    row = (
        df.agg(
            F.date_trunc(unit, F.min(ts_col)).alias("_lo"),
            F.date_trunc(unit, F.max(ts_col)).alias("_hi"),
        )
        .select("_lo", F.expr(f"timestampdiff({u}, _lo, _hi)").alias("_n"))
        .first()
    )
    spark = df.sparkSession
    if row["_lo"] is None:  # empty input: empty spine, right schema
        return spark.range(0).select(
            F.lit(None).cast("timestamp").alias("bucket")
        )
    return (
        spark.range(int(row["_n"]) + 1)
        .select(F.lit(row["_lo"]).alias("_lo"), "id")
        .select(
            # id stays BIGINT: timestampadd takes the long directly, so the
            # spine really is memory-flat at any length — a CAST(id AS INT)
            # here would silently wrap past 2^31-1 buckets (~68 years of
            # seconds), turning the tail of a long spine into 1970s stamps.
            F.expr(f"timestampadd({u}, id, _lo)").alias("bucket")
        )
    )


def gap_fill(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str],
    aggs: Mapping[str, Column],
    *,
    unit: str = "hour",
    fill_zero: Iterable[str] = (),
    locf: Iterable[str] = (),
) -> DataFrame:
    """Resample ``df`` onto a complete (group × bucket) grid.

    ``aggs`` maps output-column name → aggregate expression, evaluated per
    (group, date_trunc(unit, ts)) cell. Missing cells appear with NULLs,
    then ``fill_zero`` columns are coalesced to 0 and ``locf`` columns are
    forward-filled within their series (NULL before the first observation,
    matching SQL ``last_value IGNORE NULLS``).
    """
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    actual = df.groupBy(*group_cols, bucket).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    grid = time_spine(df, ts_col, unit).crossJoin(
        F.broadcast(df.select(*group_cols).distinct())
    )
    out = grid.join(actual, on=[*group_cols, "bucket"], how="left")
    for name in fill_zero:
        out = out.withColumn(name, F.coalesce(F.col(name), F.lit(0)))
    if locf:
        w = (
            Window.partitionBy(*group_cols)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for name in locf:
            out = out.withColumn(name, F.last(name, ignorenulls=True).over(w))
    return out


def interpolate_linear(
    df: DataFrame,
    bucket_col: str,
    group_cols: list[str],
    value_cols: Iterable[str],
) -> DataFrame:
    """Linear interpolation of NULL cells on an already-gridded series
    (the output of :func:`gap_fill`): each missing value becomes the
    time-weighted blend of the nearest preceding and following
    observations; leading/trailing gaps (no observation on one side)
    stay NULL.

    Four window expressions per column (prev/next value and their bucket
    positions), all over the same per-series sort — Spark evaluates them
    in one window stage, so the cost matches plain LOCF."""
    pos = F.col(bucket_col).cast("double")
    back = (
        Window.partitionBy(*group_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*group_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    out = df
    for c in value_cols:
        at = F.when(F.col(c).isNotNull(), pos)
        pv, pt = F.last(c, ignorenulls=True).over(back), F.last(at, ignorenulls=True).over(back)
        nv, nt = F.first(c, ignorenulls=True).over(fwd), F.first(at, ignorenulls=True).over(fwd)
        frac = (pos - pt) / (nt - pt)
        interp = F.when(F.col(c).isNotNull(), F.col(c)).otherwise(
            F.when(pv.isNotNull() & nv.isNotNull(), pv + (nv - pv) * frac)
        )
        out = out.withColumn(c, interp)
    return out


def hourly_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    dims: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Hypertable-style continuous aggregate: events pre-aggregated to
    (hour bucket × dims) cells with mergeable summaries — exact decimal
    sum, count, min, max.

    This is the table a TimescaleDB continuous aggregate / materialized
    rollup maintains. Built batch here; the streaming twin is
    ``streaming.events.tumbling_counts`` (same bucketing, incremental).
    Every summary is re-mergeable (sum/count/min/max are semigroups), so
    coarser rollups (day/month) derive from this one without touching raw
    data — the rollup cascade that makes year-scans cheap at 100 TB.
    """
    bucket = F.date_trunc("hour", F.col(ts_col)).alias("bucket")
    return events.groupBy(bucket, *[F.col(d) for d in dims]).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(value_col).cast("decimal(18,4)"))
        .cast("decimal(38,4)")
        .alias("value_sum"),
        F.min(F.col(value_col)).alias("value_min"),
        F.max(F.col(value_col)).alias("value_max"),
    )


def rollup_with_tail(
    rollup: DataFrame,
    raw_tail: DataFrame,
    cutoff,
    ts_col: str = "ts",
    dims: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Serve a full-range hourly aggregate from rollup + raw tail: buckets
    before ``cutoff`` come from the pre-aggregated rollup (no raw scan),
    buckets at/after it aggregate the raw tail live — the
    continuous-aggregate read path (finalized buckets materialized, the
    in-progress tail computed on demand).

    ``cutoff`` must lie on an hour boundary so no bucket straddles the
    seam; the result is bucket-for-bucket identical to aggregating raw
    events over the whole range (the ev08 oracle proves it).
    """
    head = rollup.filter(F.col("bucket") < F.lit(cutoff).cast("timestamp"))
    tail = hourly_rollup(
        raw_tail.filter(F.col(ts_col) >= F.lit(cutoff).cast("timestamp")),
        ts_col,
        dims,
        value_col,
    )
    return head.unionByName(tail)


def sketch_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    dims: tuple[str, ...] = ("event_type",),
    key_col: str = "user_id",
    granularity: str = "hour",
) -> DataFrame:
    """Continuous aggregate with a MERGEABLE distinct-count summary: each
    (bucket × dims) cell carries an HLL sketch of ``key_col`` (Spark's
    Apache DataSketches HllSketch) plus the exact row count.

    COUNT(DISTINCT) is the one summary a plain rollup cannot cascade —
    distinct counts don't add. Sketches restore the semigroup property:
    hourly sketches union into daily/monthly ones (:func:`merge_sketch_
    rollup`) without ever re-reading raw data, which is what makes
    distinct-users-per-period dashboards feasible over a 100 TB event
    table. Sketch build is one map-side pass; the shuffle carries
    kilobyte sketches per cell, not member sets."""
    bucket = F.date_trunc(granularity, F.col(ts_col)).alias("bucket")
    return events.groupBy(bucket, *[F.col(d) for d in dims]).agg(
        F.hll_sketch_agg(F.col(key_col)).alias("key_sketch"),
        F.count(F.lit(1)).alias("cnt"),
    )


def merge_sketch_rollup(
    rollup: DataFrame,
    to_granularity: str = "day",
    dims: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Cascade a sketch rollup to a coarser granularity by UNIONING the
    sketches (`hll_union_agg`) — no raw-data access; the estimate at any
    level is available via :func:`sketch_estimate`."""
    bucket = F.date_trunc(to_granularity, F.col("bucket")).alias("bucket")
    return rollup.groupBy(bucket, *[F.col(d) for d in dims]).agg(
        F.hll_union_agg(F.col("key_sketch")).alias("key_sketch"),
        F.sum("cnt").alias("cnt"),
    )


def sketch_estimate(rollup: DataFrame) -> DataFrame:
    """Replace the sketch column with its distinct-count estimate."""
    return rollup.withColumn(
        "approx_distinct", F.hll_sketch_estimate(F.col("key_sketch"))
    ).drop("key_sketch")


def level_shifts(
    df: DataFrame,
    ts_col: str,
    dims: tuple[str, ...],
    value_col: str,
    granularity: str = "hour",
    window: int = 6,
    rel_threshold: float = 0.25,
) -> DataFrame:
    """Temporal level-shift detection (windowed change-point test): per
    series, compare each bucket's trailing ``window``-bucket mean against
    the ``window`` buckets before those; flag buckets where the level
    moved by more than ``rel_threshold`` relative to the prior window.
    The monitoring companion to :func:`~..operators.profiling.psi_report`
    (distribution drift between two corpus snapshots) — this one watches
    a metric's LEVEL over continuous time and points at when it moved.

    Returns one row per (bucket × dims) with ``bucket_avg``,
    ``recent_avg``, ``prior_avg``, ``rel_change`` (NULL until both
    windows are full — no partial-window false positives) and
    ``shifted``.

    Determinism: bucket means come from exact DECIMAL sums (order-
    independent across partitions) divided in double once per bucket;
    the window means then average a FIXED-SIZE ordered frame of those
    doubles, so any engine replays the exact IEEE values. Scale shape:
    one groupBy to bucket means (rows ≈ buckets × series, tiny), then
    two ROWS-frame windows partitioned by the series key — never over
    raw data."""
    bucket = F.date_trunc(granularity, F.col(ts_col)).alias("bucket")
    dim_cols = [F.col(d) for d in dims]
    per_bucket = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(bucket, *dim_cols)
        .agg(
            (
                F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1))
            ).alias("bucket_avg")
        )
    )
    order = Window.partitionBy(*[F.col(d) for d in dims]).orderBy("bucket")
    recent = order.rowsBetween(-(window - 1), 0)
    prior = order.rowsBetween(-(2 * window - 1), -window)
    out = (
        per_bucket.withColumn("recent_avg", F.avg("bucket_avg").over(recent))
        .withColumn("prior_avg", F.avg("bucket_avg").over(prior))
        .withColumn("_n_prior", F.count("bucket_avg").over(prior))
        .withColumn(
            "rel_change",
            F.when(
                (F.col("_n_prior") == window) & (F.col("prior_avg") != 0),
                (F.col("recent_avg") - F.col("prior_avg")) / F.abs(F.col("prior_avg")),
            ),
        )
        .withColumn(
            "shifted",
            F.when(
                F.col("rel_change").isNotNull(),
                F.abs(F.col("rel_change")) > rel_threshold,
            ),
        )
        .drop("_n_prior")
    )
    return out


def apply_rollup_delta(
    rollup: DataFrame,
    changelog: DataFrame,
    ts_col: str = "ts",
    dims: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Incremental materialized-view maintenance: fold a CDC changelog
    (``_change_type`` ∈ insert/delete/update_before/update_after — the
    Iceberg changelog-view / Delta CDF shape emitted by
    ``catalog.snapshots.SnapshotTable.changelog``) into an existing
    ``(bucket, dims..., cnt, value_sum)`` hourly rollup WITHOUT touching
    raw history: inserts/update_afters count +1, deletes/update_befores
    count −1, value sums move by the signed exact-DECIMAL value.

    This is the continuous-aggregate refresh path at 100 TB: the
    changelog between two snapshots reads only the touched files
    (copy-on-write symmetric difference), the delta aggregates to
    (bucket × dims) cells, and the merge is a full-outer join on cell
    keys — cost proportional to the CHANGE, never to the table. Cells
    whose count reaches zero drop out, cells new in the delta appear.

    Only the semigroup summaries (count, exact sum) maintain under
    deletion; min/max do not (a deleted extremum needs a re-scan of its
    cell) — recompute those from raw for affected buckets, or track a
    mergeable sketch instead."""
    bucket = F.date_trunc("hour", F.col(ts_col)).alias("bucket")
    keys = ["bucket", *dims]
    sign = F.when(
        F.col("_change_type").isin("insert", "update_after"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = (
        changelog.select(
            bucket,
            *[F.col(d) for d in dims],
            sign.alias("_s"),
            F.col(value_col).cast("decimal(18,4)").alias("_v"),
        )
        .groupBy(*keys)
        .agg(
            F.sum("_s").alias("_dcnt"),
            F.sum(F.col("_s") * F.col("_v")).cast("decimal(38,4)").alias("_dsum"),
        )
    )
    merged = rollup.join(delta, keys, "full").select(
        *keys,
        (F.coalesce(F.col("cnt"), F.lit(0)) + F.coalesce(F.col("_dcnt"), F.lit(0))).alias(
            "cnt"
        ),
        (
            F.coalesce(F.col("value_sum"), F.lit(0).cast("decimal(38,4)"))
            + F.coalesce(F.col("_dsum"), F.lit(0).cast("decimal(38,4)"))
        )
        .cast("decimal(38,4)")
        .alias("value_sum"),
    )
    return merged.filter(F.col("cnt") > 0)
