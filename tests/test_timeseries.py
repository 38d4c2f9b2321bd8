"""Gap-fill / LOCF boundary semantics (operators/timeseries.py) that the
grid-level oracle can't isolate: missing-cell creation, zero fill, leading
NULLs before the first observation, multi-series independence."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from trino_iceberg_spark.operators.timeseries import gap_fill, time_spine


def _events(spark):
    rows = [
        # series "a": observations at hours 0 and 3 -> gaps at 1, 2
        (dt.datetime(2024, 5, 1, 0, 15), "a", 10.0),
        (dt.datetime(2024, 5, 1, 3, 5), "a", 30.0),
        # series "b": single observation at hour 2
        (dt.datetime(2024, 5, 1, 2, 45), "b", 7.0),
    ]
    return spark.createDataFrame(rows, "ts timestamp, series string, value double")


def test_time_spine_dense(spark):
    spine = time_spine(_events(spark), "ts", "hour").collect()
    hours = sorted(r.bucket for r in spine)
    assert hours == [dt.datetime(2024, 5, 1, h) for h in range(4)]


def test_time_spine_minute_granularity_multiyear(spark):
    """The spark.range spine (round 11) is memory-flat at any length: a
    4-year minute spine (~2.1M buckets) would have been a single 2.1M-
    element array under the old sequence+explode construction. Endpoint
    and count pin the timestampadd arithmetic against the old interval
    semantics."""
    df = spark.createDataFrame(
        [(dt.datetime(2020, 1, 1, 0, 0, 30),), (dt.datetime(2023, 12, 31, 23, 59, 59),)],
        "ts timestamp",
    )
    spine = time_spine(df, "ts", "minute")
    n = (366 + 365 * 3) * 1440  # 2020 is a leap year
    assert spine.count() == n
    lo, hi = spine.agg(F.min("bucket"), F.max("bucket")).first()
    assert lo == dt.datetime(2020, 1, 1, 0, 0)
    assert hi == dt.datetime(2023, 12, 31, 23, 59)


def test_time_spine_empty_input(spark):
    df = spark.createDataFrame([], "ts timestamp")
    spine = time_spine(df, "ts", "hour")
    assert spine.count() == 0
    assert spine.columns == ["bucket"]


def test_gap_fill_zero_and_locf(spark):
    out = gap_fill(
        _events(spark),
        "ts",
        ["series"],
        {"n": F.count(F.lit(1)), "v": F.max("value")},
        unit="hour",
        fill_zero=["n"],
        locf=["v"],
    ).collect()
    cells = {(r.series, r.bucket.hour): (r.n, r.v) for r in out}
    assert len(cells) == 8  # 2 series x 4 hours, gaps materialized
    assert cells[("a", 1)] == (0, 10.0)  # zero-filled count, carried value
    assert cells[("a", 2)] == (0, 10.0)
    assert cells[("a", 3)] == (1, 30.0)  # fresh observation replaces carry
    # leading cells before b's first observation stay NULL, not carried
    assert cells[("b", 0)] == (0, None)
    assert cells[("b", 1)] == (0, None)
    assert cells[("b", 2)] == (1, 7.0)
    assert cells[("b", 3)] == (0, 7.0)  # b's carry unaffected by series a


def test_group_zscore_outliers_planted(spark):
    from trino_iceberg_spark.operators.profiling import group_zscore_outliers

    rows = [("a", float(v)) for v in [10, 11, 9, 10, 10, 11, 9, 10, 100]] + [
        ("b", float(v)) for v in [5, 5, 5, 5, 5, 5, 5, 5, 5]
    ]
    df = spark.createDataFrame(rows, "grp string, value double")
    out = group_zscore_outliers(df, "value", ["grp"], z_threshold=2.0).collect()
    assert len(out) == 1  # only the planted 100; constant group b yields no outliers
    assert out[0].grp == "a" and out[0].value == 100.0 and out[0].zscore > 2.0


def test_column_correlations_known_values(spark):
    from trino_iceberg_spark.operators.profiling import column_correlations

    rows = [(float(i), float(2 * i), float(-i), 5.0) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "x double, y double, z double, c double")
    got = {
        (r.col_a, r.col_b): r.corr
        for r in column_correlations(df, ["x", "y", "z", "c"]).collect()
    }
    assert abs(got[("x", "y")] - 1.0) < 1e-9   # perfectly linear
    assert abs(got[("x", "z")] + 1.0) < 1e-9   # perfectly anti-linear
    assert got[("x", "c")] is None             # constant column: undefined, not an error
    assert len(got) == 6                       # upper triangle of 4 columns


def test_interpolate_linear_midpoints_and_edges(spark):
    from trino_iceberg_spark.operators.timeseries import gap_fill, interpolate_linear

    rows = [
        (dt.datetime(2024, 5, 1, 0), "a", 10.0),
        (dt.datetime(2024, 5, 1, 3), "a", 40.0),  # gap hours 1,2 -> 20, 30
        (dt.datetime(2024, 5, 1, 2), "b", 8.0),   # b: leading gaps stay NULL
    ]
    df = spark.createDataFrame(rows, "ts timestamp, series string, value double")
    grid = gap_fill(df, "ts", ["series"], {"v": F.max("value")}, unit="hour")
    out = interpolate_linear(grid, "bucket", ["series"], ["v"])
    cells = {(r.series, r.bucket.hour): r.v for r in out.collect()}
    assert cells[("a", 1)] == 20.0 and cells[("a", 2)] == 30.0
    assert cells[("a", 0)] == 10.0 and cells[("a", 3)] == 40.0  # observations untouched
    assert cells[("b", 0)] is None and cells[("b", 1)] is None  # no left anchor
    assert cells[("b", 3)] is None  # no right anchor


def test_column_correlations_pairwise_complete_nulls(spark):
    """A NULL in one column must only exclude that row from pairs involving
    that column — and n/Σ for each pair must cover the same row subset."""
    from trino_iceberg_spark.operators.profiling import column_correlations

    # x,y perfectly linear on rows where both present; z has a NULL row and
    # is otherwise linear in x only over the complete rows.
    rows = [
        (1.0, 2.0, 10.0),
        (2.0, 4.0, None),
        (3.0, 6.0, 30.0),
        (4.0, None, 40.0),
        (5.0, 10.0, 50.0),
    ]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    got = {
        (r.col_a, r.col_b): r.corr
        for r in column_correlations(df, ["x", "y", "z"]).collect()
    }
    assert abs(got[("x", "y")] - 1.0) < 1e-9  # rows 1,2,3,5 — still exact
    assert abs(got[("x", "z")] - 1.0) < 1e-9  # rows 1,3,4,5 — still exact
    assert abs(got[("y", "z")] - 1.0) < 1e-9  # rows 1,3,5 — still exact


def test_rollup_cascade_day_from_hour(spark):
    """Daily summaries derived from the hourly rollup equal daily
    summaries from raw — the semigroup-merge property coarser rollups
    rely on."""
    import datetime as dt
    from pyspark.sql import functions as F
    from trino_iceberg_spark.operators.timeseries import hourly_rollup

    rows = [
        (dt.datetime(2024, 1, 1 + d, h, m), "t", float(d * 100 + h + m) / 4)
        for d in range(2) for h in (0, 5, 23) for m in (1, 30)
    ]
    e = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    hourly = hourly_rollup(e)
    daily_from_rollup = (
        hourly.groupBy(F.date_trunc("day", "bucket").alias("day"), "event_type")
        .agg(F.sum("cnt").alias("cnt"), F.sum("value_sum").alias("value_sum"),
             F.min("value_min").alias("value_min"), F.max("value_max").alias("value_max"))
    )
    daily_from_raw = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"),
             F.sum(F.col("value").cast("decimal(18,4)")).cast("decimal(38,4)").alias("value_sum"),
             F.min("value").alias("value_min"), F.max("value").alias("value_max"))
    )
    a = {tuple(r[:2]): tuple(r[2:]) for r in daily_from_rollup.collect()}
    b = {tuple(r[:2]): tuple(r[2:]) for r in daily_from_raw.collect()}
    assert a == b


def test_rollup_with_tail_matches_full_aggregate(spark):
    import datetime as dt
    from pyspark.sql import functions as F
    from trino_iceberg_spark.operators.timeseries import hourly_rollup, rollup_with_tail

    rows = [
        (dt.datetime(2024, 1, 1, h, m), "t", float(h * 60 + m))
        for h in range(6) for m in (0, 15, 45)
    ]
    e = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    cutoff = "2024-01-01 03:00:00"
    rollup = hourly_rollup(e.filter(F.col("ts") < F.lit(cutoff).cast("timestamp")))
    combined = rollup_with_tail(rollup, e, cutoff)
    direct = hourly_rollup(e)
    a = sorted(map(tuple, combined.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b and len(a) == 6


def test_level_shifts_flags_step_and_guards_partial_windows(spark):
    import datetime as dt

    from trino_iceberg_spark.operators.timeseries import level_shifts

    rows = []
    for h in range(24):
        v = 10.0 if h < 12 else 20.0  # step change at noon
        rows.append(("a", dt.datetime(2024, 3, 1, h, 30), v))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        r["bucket"].hour: r
        for r in level_shifts(
            df, "ts", ("k",), "v", "hour", window=6, rel_threshold=0.25
        ).collect()
    }
    # first 11 buckets: prior window not full -> no verdict either way
    for h in range(11):
        assert out[h]["rel_change"] is None and out[h]["shifted"] is None
    # steady state before the step: full windows, no shift
    assert out[11]["shifted"] is False
    # after the step the trailing mean pulls away from the prior window
    assert out[17]["shifted"] is True and out[17]["rel_change"] > 0.25
    # far after the step both windows sit at the new level again
    assert out[23]["shifted"] is False


def test_apply_rollup_delta_handles_all_change_types(spark):
    """insert / delete / update_before / update_after all fold correctly:
    maintained rollup == recomputed rollup after an update commit."""
    import datetime as dt

    from pyspark.sql import functions as F

    from trino_iceberg_spark.operators.timeseries import (
        apply_rollup_delta,
        hourly_rollup,
    )

    t0 = dt.datetime(2024, 5, 1, 10, 15)
    base_rows = [(1, t0, "a", 10.0), (2, t0, "a", 20.0), (3, t0, "b", 5.0)]
    base = spark.createDataFrame(base_rows, "event_id long, ts timestamp, event_type string, value double")
    rollup = hourly_rollup(base).select("bucket", "event_type", "cnt", "value_sum")

    # change: event 2's value 20 -> 25 (update pair), event 3 deleted,
    # event 4 inserted into a NEW hour
    t1 = dt.datetime(2024, 5, 1, 11, 5)
    chg = spark.createDataFrame(
        [
            (2, t0, "a", 20.0, "update_before"),
            (2, t0, "a", 25.0, "update_after"),
            (3, t0, "b", 5.0, "delete"),
            (4, t1, "a", 7.0, "insert"),
        ],
        "event_id long, ts timestamp, event_type string, value double, _change_type string",
    )
    maintained = {
        (r["bucket"], r["event_type"]): (r["cnt"], float(r["value_sum"]))
        for r in apply_rollup_delta(rollup, chg).collect()
    }
    final_rows = [(1, t0, "a", 10.0), (2, t0, "a", 25.0), (4, t1, "a", 7.0)]
    final = spark.createDataFrame(final_rows, "event_id long, ts timestamp, event_type string, value double")
    recomputed = {
        (r["bucket"], r["event_type"]): (r["cnt"], float(r["value_sum"]))
        for r in hourly_rollup(final).select("bucket", "event_type", "cnt", "value_sum").collect()
    }
    assert maintained == recomputed
    # the zero-count 'b' cell dropped out
    assert all(k[1] != "b" for k in maintained)


def test_time_spine_validates_unit_and_long_range(spark):
    """Round-11 advisor: the spine quantity stays BIGINT (no int32 wrap
    past 2^31-1 buckets) and the unit is allowlisted before it reaches
    F.expr interpolation."""
    import datetime as dt

    import pytest

    from trino_iceberg_spark.operators.timeseries import time_spine

    df = spark.createDataFrame(
        [(dt.datetime(2020, 1, 1),), (dt.datetime(2020, 1, 2),)],
        "ts timestamp",
    )
    with pytest.raises(ValueError):
        time_spine(df, "ts", unit="fortnight; DROP TABLE x")
    # bigint quantity: the physical plan must carry no CAST(... AS INT)
    plan = time_spine(df, "ts", unit="hour")._jdf.queryExecution().toString()
    assert "cast(id as int)" not in plan.lower()
    assert time_spine(df, "ts", unit="hour").count() == 25
