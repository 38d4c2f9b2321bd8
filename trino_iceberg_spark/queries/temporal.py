"""Temporal-join query entries: as-of join and bucketized range join
(operators.joins) — oracle-checked against DuckDB's native ASOF JOIN and a
plain theta join respectively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import asof_join, range_join
from ..sources.testdata import load_table
from .registry import register


@register(
    "aj01_asof_join",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), views AS (
        SELECT event_id AS view_event_id, user_id, ts AS view_ts
        FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id,
           CAST(v.view_event_id AS BIGINT) AS view_event_id,
           CAST(epoch_us(p.ts) - epoch_us(v.view_ts) AS BIGINT) AS us_since_view
    FROM purchases p
    ASOF LEFT JOIN views v ON p.user_id = v.user_id AND v.view_ts <= p.ts
    ORDER BY p.event_id
    """,
)
def aj01_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest preceding view by the same
    user (operators.joins.asof_join — single merged window pass, one shuffle
    on user_id; checked against DuckDB's native ASOF JOIN)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"), F.col("user_id"), F.col("ts")
    )
    joined = asof_join(
        purchases, views, on="user_id", left_time="ts", right_time="ts", direction="backward"
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("view_event_id").cast("long").alias("view_event_id"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_r"))).alias("us_since_view"),
    ).orderBy("event_id")


@register(
    "rj01_bucketized_range_join",
    oracle="""
    WITH bands AS (
        SELECT CAST(i AS BIGINT) * 50 AS lo, CAST(i + 1 AS BIGINT) * 50 AS hi,
               'band_' || CAST(i AS VARCHAR) AS band_name
        FROM range(10) t(i)
    )
    SELECT b.band_name, COUNT(*) AS cnt,
           CAST(MIN(e.event_id) AS BIGINT) AS min_event
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band_name ORDER BY b.band_name
    """,
)
def rj01_bucketized_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact range join via bucketization (operators.joins.range_join):
    events.value joined into [lo, hi) bands through an equi-join on bucket
    id + exact filter — no broadcast-NLJ."""
    e = load_table(spark, sf_dir, "events")
    bands = spark.range(10).select(
        (F.col("id") * 50).cast("long").alias("lo"),
        ((F.col("id") + 1) * 50).cast("long").alias("hi"),
        F.concat(F.lit("band_"), F.col("id").cast("string")).alias("band_name"),
    )
    joined = range_join(
        e.withColumn("value_pt", F.col("value")),
        bands,
        left_point="value_pt",
        right_lo="lo",
        right_hi="hi",
        bucket_width=50,
    )
    return (
        joined.groupBy("band_name")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("event_id").cast("long").alias("min_event"))
        .orderBy("band_name")
    )


@register(
    "aj02_asof_forward_tolerance",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), purchases AS (
        SELECT user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id,
           (SELECT MIN(p.p_ts) FROM purchases p
            WHERE p.user_id = c.user_id AND p.p_ts >= c.ts
              AND p.p_ts <= c.ts + INTERVAL 1 HOUR) AS next_purchase_ts
    FROM clicks c
    ORDER BY c.event_id
    """,
)
def aj02_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with a tolerance horizon (operators.joins.asof_join,
    direction='forward', tolerance_us=1h): for each click, the EARLIEST
    purchase by the same user within the next hour, NULL when none — the
    attribution-window join (click → conversion within h). Same single
    merged-window shuffle as aj01, reversed sort; the tolerance is a
    map-side post-filter, not a range explosion. The oracle states the
    semantics as a correlated MIN-over-future subquery."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("ts")
    )
    joined = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_time="ts",
        right_time="ts",
        direction="forward",
        tolerance_us=3_600_000_000,
    )
    return joined.select(
        "event_id", "user_id", F.col("ts_r").alias("next_purchase_ts")
    ).orderBy("event_id")
