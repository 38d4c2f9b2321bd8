"""Temporal join operators Spark lacks natively: as-of join and fact-fact
range join (guide 'Common OLAP patterns'; reference has no joins at all —
these serve the engine's event-analytics surface).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    direction: str = "backward",
    tolerance_us: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_time <= left_time (direction='backward'; 'forward' = earliest ≥),
    per key ``on``.

    Implementation: union both sides tagged, one window sort per key over
    the merged stream, ``last(right value, ignorenulls)`` carries the most
    recent right row forward — a single shuffle on the key, no range
    explosion, no per-group pandas. This is the merge-asof expressed as a
    window, so it scales like any windowed aggregate (AQE handles key skew)."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    rcols = [c for c in right.columns if c != on and c != right_time]
    rstruct = F.struct(
        F.col(right_time).alias("_r_time"), *[F.col(c) for c in rcols]
    )
    r = right.select(
        F.col(on), F.col(right_time).alias("_t"), F.lit(0).alias("_side"), rstruct.alias("_rv")
    )
    lcols = left.columns
    l = left.select(
        F.col(on),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    r = r.select(
        on, "_t", "_side", "_rv", *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols]
    )
    merged = l.unionByName(r)
    if direction == "backward":
        # right rows sort before left rows at equal times → "<=" semantics
        w = W.partitionBy(on).orderBy(F.col("_t"), F.col("_side")).rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
        carried = F.last("_rv", ignorenulls=True).over(w)
    else:
        w = W.partitionBy(on).orderBy(F.col("_t").desc(), F.col("_side")).rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
        carried = F.last("_rv", ignorenulls=True).over(w)
    out = (
        merged.withColumn("_matched", carried)
        .filter(F.col("_side") == 1)
        .select(
            *[F.col(f"_l_{c}").alias(c) for c in lcols],
            F.col("_matched").alias("_rv"),
        )
    )
    if tolerance_us is not None:
        lt = F.unix_micros(F.col(left_time))
        rt = F.unix_micros(F.col("_rv")["_r_time"])
        within = (
            (lt - rt <= tolerance_us) if direction == "backward" else (rt - lt <= tolerance_us)
        )
        out = out.withColumn("_rv", F.when(within, F.col("_rv")))
    for c in rcols:
        out = out.withColumn(f"{c}{suffix}" if c in lcols else c, F.col("_rv")[c])
    return out.withColumn(
        f"{right_time}{suffix}", F.col("_rv")["_r_time"]
    ).drop("_rv")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Fact-fact range join: left.point ∈ [right.lo, right.hi).

    Naive theta joins degenerate to broadcast-NLJ; instead both sides are
    bucketized on the range key (``bucket_width`` units), intervals explode
    into the buckets they overlap, and the join is an equi-join on bucket +
    exact filter. Shuffle cost ~ data × mean-interval-width/bucket_width —
    the standard interval-join strategy (Flink/KDB do the same)."""
    if bucket_width is None or bucket_width <= 0:
        raise ValueError("bucket_width is required (choose ~ median interval width)")
    lb = (F.col(left_point) / bucket_width).cast("long").alias("_bucket")
    l = left.withColumn("_bucket", lb)
    buckets = F.sequence(
        (F.col(right_lo) / bucket_width).cast("long"),
        (F.col(right_hi) / bucket_width).cast("long"),
    )
    r = right.withColumn("_bucket", F.explode(buckets))
    cond = (
        (l["_bucket"] == r["_bucket"])
        & (F.col(left_point) >= F.col(right_lo))
        & (F.col(left_point) < F.col(right_hi))
    )
    joined = l.join(r, cond, how).drop("_bucket")
    return joined
