"""Window-function queries (SURVEY.md §2.C — window surface).

Windows shuffle once on the partition key; all functions over the same
(partitionBy, orderBy) share a single sort — each query keeps one window
spec so the plan has exactly one Window exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .compat import dec, dsum_sql
from .registry import register


@register(
    "w01_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        FROM orders
    ) WHERE rn <= 3 AND o_custkey <= 200
    ORDER BY o_custkey, rn
    """,
)
def w01_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ROW_NUMBER — the canonical pattern (pyspark guide).
    Catalyst inserts a WindowGroupLimit (rank-limit pushdown) so each
    partition keeps only K rows before the final filter."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 3) & (F.col("o_custkey") <= 200))
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


@register(
    "w02_rank_dense",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           CAST(RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS INTEGER) AS size_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS INTEGER) AS size_dense_rank
    FROM part WHERE p_partkey <= 300
    ORDER BY p_brand, size_rank, p_partkey
    """,
)
def w02_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK with ties (p_size repeats within a brand)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    w = W.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.rank().over(w).alias("size_rank"),
            F.dense_rank().over(w).alias("size_dense_rank"),
        )
        .orderBy("p_brand", "size_rank", "p_partkey")
    )


@register(
    "w03_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS BIGINT) AS us_since_prev,
           LEAD(event_type) OVER w AS next_type
    FROM events WHERE user_id <= 50
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
)
def w03_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD across event streams: inter-event gap + next event type.
    Gaps computed in exact integer microseconds (unix_micros/epoch_us) —
    float seconds would truncate differently across engines."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev_us = F.unix_micros(F.lag("ts").over(w))
    return (
        e.select(
            "user_id",
            "event_id",
            (us - prev_us).alias("us_since_prev"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "w04_running_sum",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM orders WHERE o_custkey <= 100
    ORDER BY o_custkey, o_orderkey
    """,
)
def w04_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total (cumulative frame). Decimal-exact so the running values
    hash-match the oracle at every row, not just the end."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "w05_ntile_percent",
    oracle="""
    SELECT c_custkey,
           CAST(NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS balance_quartile,
           CAST(PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey) AS DOUBLE) AS balance_pct_rank
    FROM customer WHERE c_custkey <= 400
    ORDER BY c_custkey
    """,
)
def w05_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE + PERCENT_RANK (global window — acceptable only on pre-filtered
    slices; unbounded global sorts are an anti-pattern at 100 TB, which is
    why the filter precedes the window AND a hard row-count guard refuses
    to build the single-task plan over an unbounded slice: failing loudly
    beats an executor-OOM hours into a 100 TB job)."""
    from ..errors import EngineError

    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 400)
    n = c.count()  # cheap: count over the pushed-down filter scan
    if n > 5_000_000:
        raise EngineError(
            f"w05 global NTILE window over {n} rows: global windows funnel "
            f"every row through ONE task — pre-filter the slice below 5M "
            f"rows or use an approx-percentile bucketing instead"
        )
    w = W.orderBy("c_acctbal", "c_custkey")
    return (
        c.select(
            "c_custkey",
            F.ntile(4).over(w).alias("balance_quartile"),
            F.percent_rank().over(w).alias("balance_pct_rank"),
        )
        .orderBy("c_custkey")
    )


@register(
    "w06_sessionize",
    oracle="""
    WITH gaps AS (
        SELECT user_id, event_id, ts,
               CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new_session
        FROM events
    ), sessions AS (
        SELECT user_id, event_id, ts,
               CAST(SUM(is_new_session) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        FROM gaps
    )
    SELECT user_id, session_seq, COUNT(*) AS events_in_session,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sessions WHERE user_id <= 100
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def w06_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap sessions via lag + cumulative sum — the
    batch analog of streaming session windows (guide 'Common OLAP patterns').
    One shuffle on user_id; both windows share it."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev_us = F.unix_micros(F.lag("ts").over(w))
    gap_flag = F.when(prev_us.isNull() | ((us - prev_us) > 1800000000), 1).otherwise(0)
    cum = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        e.withColumn("is_new_session", gap_flag)
        .withColumn("session_seq", F.sum("is_new_session").over(cum).cast("long"))
        .filter(F.col("user_id") <= 100)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("events_in_session"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_seq")
    )


@register(
    "w07_moving_average",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(18,4))) AS day_value
        FROM events GROUP BY event_type, day
    )
    SELECT event_type, day,
           CAST(CAST(SUM(day_value) OVER w AS DECIMAL(38,4)) AS DOUBLE)
             / COUNT(*) OVER w AS ma4
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    ORDER BY event_type, day
    """,
)
def w07_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-day moving average per event type — a bounded ROWS frame over the
    pre-aggregated daily series (the frame runs over days, not raw events,
    so window state is day-count-sized). Exact decimal sum / count keeps
    the average order-independent."""
    from ..sources.testdata import load_table as _lt

    ev = _lt(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("day_value"))
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(-3, 0)
    return daily.select(
        "event_type",
        "day",
        (
            F.sum("day_value").over(w).cast("decimal(38,4)").cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("ma4"),
    ).orderBy("event_type", "day")


@register(
    "w08_distribution_functions",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           first_value(o_orderkey) OVER
               (PARTITION BY o_orderpriority
                ORDER BY o_totalprice, o_orderkey) AS cheapest_key
    FROM orders
    WHERE o_orderkey <= 5000
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
    ORDER BY o_orderkey
    """,
)
def w08_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist (exact
    rationals — identical doubles on both engines) and first_value with a
    deterministic tie-break ordering."""
    from ..sources.testdata import load_table as _lt

    o = _lt(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    wf = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(wf).alias("cheapest_key"),
    ).orderBy("o_orderkey")


@register(
    "w09_time_range_frame",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
               value
        FROM events WHERE user_id <= 20
    )
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_1h,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DECIMAL(38,4))
                AS DOUBLE) AS sum_1h
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def w09_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per user, the trailing-hour event
    count and exact-decimal value sum. The frame is a numeric range over
    epoch seconds (``Window.rangeBetween(-3600, 0)``) — identical peer and
    boundary semantics on both engines, unlike interval frames whose
    timestamp rounding differs. One shuffle on user_id; the frame scan is
    a single ordered pass per partition."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("_sec"))
        .rangeBetween(-3600, 0)
    )
    return (
        e.withColumn("_sec", F.unix_timestamp("ts"))
        .select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .over(w)
            .cast("decimal(38,4)")
            .cast("double")
            .alias("sum_1h"),
        )
        .orderBy("event_id")
    )


@register(
    "w10_value_navigation",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        FROM events WHERE user_id <= 20
    )
    SELECT event_id, user_id,
           first_value(v IGNORE NULLS) OVER cum AS first_nonnull,
           last_value(v IGNORE NULLS) OVER cum AS locf_value,
           nth_value(v, 2) OVER whole AS second_value
    FROM e
    WINDOW cum AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           whole AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY event_id
    """,
)
def w10_value_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-navigation window functions with NULL semantics: first
    non-null observation so far, last-observation-carried-forward (both
    IGNORE NULLS over a cumulative frame — the sensor-reading fill
    pattern), and nth_value over the whole partition. Error events stand
    in as the NULL holes. Single shuffle on user_id; all three evaluate
    in the same ordered pass."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    order = [F.col("ts"), F.col("event_id")]
    cum = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    full = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        e.withColumn("_v", v)
        .select(
            "event_id",
            "user_id",
            F.first("_v", ignorenulls=True).over(cum).alias("first_nonnull"),
            F.last("_v", ignorenulls=True).over(cum).alias("locf_value"),
            F.nth_value("_v", 2).over(full).alias("second_value"),
        )
        .orderBy("event_id")
    )
