"""Join operators (SURVEY.md §2.C — absent from the reference repo but part
of the engine surface; Trino-the-engine has all of them).

Scale strategy: dimension tables (region 5, nation 25, supplier ~1k rows
even at SF100) are explicitly ``broadcast()`` so fact-table joins never
shuffle the big side on the dim key; fact-fact joins (lineitem⋈orders)
shuffle on the join key and rely on AQE for skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .compat import dsum_col, dsum_sql
from .registry import register


@register(
    "j01_inner_join",
    oracle=f"""
    SELECT c.c_mktsegment AS segment, COUNT(*) AS order_cnt,
           {dsum_sql('o.o_totalprice')} AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment ORDER BY segment
    """,
)
def j01_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact⋈dim, aggregated. Customer is small relative to
    orders → broadcast; no shuffle of orders on the join key."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("order_cnt"), dsum_col("o_totalprice").alias("revenue"))
        .orderBy("segment")
    )


@register(
    "j02_multi_join",
    oracle=f"""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS cust_cnt, {dsum_sql('c.c_acctbal')} AS balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name ORDER BY region_name, nation_name
    """,
)
def j02_multi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way snowflake join; both dims broadcast → zero shuffles until
    the final aggregation."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(F.count(F.lit(1)).alias("cust_cnt"), dsum_col("c_acctbal").alias("balance"))
        .orderBy("region_name", "nation_name")
    )


@register(
    "j03_left_join",
    oracle="""
    SELECT n.n_nationkey, n.n_name, COUNT(s.s_suppkey) AS supplier_cnt
    FROM nation n LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_nationkey, n.n_name ORDER BY n.n_nationkey
    """,
)
def j03_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving unmatched left rows (COUNT(col) skips the
    NULLs the outer side introduces)."""
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    return (
        n.join(s, s.s_nationkey == n.n_nationkey, "left")
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("s_suppkey").alias("supplier_cnt"))
        .orderBy("n_nationkey")
    )


@register(
    "j04_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    ORDER BY c_custkey
    """,
)
def j04_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join = EXISTS; emits each left row at most once, never
    widens the row — the Spark-native EXISTS plan."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "j05_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
)
def j05_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join = NOT EXISTS (customers who never ordered)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "j06_full_outer",
    oracle="""
    WITH cust_n AS (SELECT c_nationkey AS k, COUNT(*) AS cust_cnt
                    FROM customer GROUP BY c_nationkey),
         supp_n AS (SELECT s_nationkey AS k, COUNT(*) AS supp_cnt
                    FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.k, s.k) AS nationkey,
           COALESCE(c.cust_cnt, 0) AS cust_cnt,
           COALESCE(s.supp_cnt, 0) AS supp_cnt
    FROM cust_n c FULL OUTER JOIN supp_n s ON c.k = s.k
    ORDER BY nationkey
    """,
)
def j06_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates (per-nation customer vs supplier
    counts), with COALESCE over both null sides."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cust_cnt"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("supp_cnt"))
    )
    return (
        c.join(s, c.k == s.k, "full_outer")
        .select(
            F.coalesce(c.k, s.k).alias("nationkey"),
            F.coalesce(F.col("cust_cnt"), F.lit(0)).cast("long").alias("cust_cnt"),
            F.coalesce(F.col("supp_cnt"), F.lit(0)).cast("long").alias("supp_cnt"),
        )
        .orderBy("nationkey")
    )


@register(
    "j07_cross_join",
    oracle="""
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey <> r2.r_regionkey
    ORDER BY from_region, to_region
    """,
)
def j07_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN (tiny×tiny only — a deliberate region pair matrix; the
    engine never cross-joins fact tables)."""
    r1 = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k1"), F.col("r_name").alias("from_region")
    )
    r2 = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k2"), F.col("r_name").alias("to_region")
    )
    return (
        r1.crossJoin(r2)
        .filter(F.col("k1") != F.col("k2"))
        .select("from_region", "to_region")
        .orderBy("from_region", "to_region")
    )


@register(
    "j08_range_join",
    oracle=f"""
    SELECT b.bucket_name, COUNT(*) AS cnt, {dsum_sql('s.s_acctbal')} AS balance
    FROM supplier s
    JOIN (
        VALUES ('low', -99999.0, 3000.0), ('mid', 3000.0, 7000.0), ('high', 7000.0, 99999.0)
    ) AS b(bucket_name, lo, hi)
      ON s.s_acctbal >= b.lo AND s.s_acctbal < b.hi
    GROUP BY b.bucket_name ORDER BY b.bucket_name
    """,
)
def j08_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: non-equi band join against a broadcast bucket table
    (the classic binning pattern — broadcast NLJ is the right plan when one
    side is tiny; for fact-fact range joins see operators.joins.range_join)."""
    s = load_table(spark, sf_dir, "supplier")
    buckets = spark.createDataFrame(
        [("low", -99999.0, 3000.0), ("mid", 3000.0, 7000.0), ("high", 7000.0, 99999.0)],
        "bucket_name string, lo double, hi double",
    )
    return (
        s.join(
            F.broadcast(buckets),
            (s.s_acctbal >= buckets.lo) & (s.s_acctbal < buckets.hi),
        )
        .groupBy("bucket_name")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum_col("s_acctbal").alias("balance"))
        .orderBy("bucket_name")
    )


@register(
    "j09_self_join",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    ORDER BY nation_a, nation_b
    """,
)
def j09_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join with inequality tie-break (unordered pairs within a region)."""
    n = load_table(spark, sf_dir, "nation")
    a = n.select(
        F.col("n_regionkey").alias("rk_a"),
        F.col("n_nationkey").alias("nk_a"),
        F.col("n_name").alias("nation_a"),
    )
    b = n.select(
        F.col("n_regionkey").alias("rk_b"),
        F.col("n_nationkey").alias("nk_b"),
        F.col("n_name").alias("nation_b"),
    )
    return (
        a.join(b, (F.col("rk_a") == F.col("rk_b")) & (F.col("nk_a") < F.col("nk_b")))
        .select("nation_a", "nation_b")
        .orderBy("nation_a", "nation_b")
    )


@register(
    "j10_bucketed_join",
    oracle="""
    SELECT o.o_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS DOUBLE) AS total_price
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey < 2000
    GROUP BY o.o_orderkey ORDER BY o.o_orderkey
    """,
)
def j10_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located fact-fact join (sources.bucketing): both
    sides written bucketed on the join key, so the join (and the
    subsequent same-key aggregate) runs with NO Exchange — the shuffle
    was paid once at write time, which is the 100 TB answer to "we join
    these two facts daily". The Exchange-free plan is pinned in
    tests/test_bucketing.py; this entry proves result parity with the
    plain (shuffled) join via the oracle."""
    import uuid as _uuid

    from ..sources.bucketing import write_bucketed

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    tag = _uuid.uuid4().hex[:8]
    to, tl = f"j10_orders_{tag}", f"j10_lineitem_{tag}"
    write_bucketed(o.select("o_orderkey"), to, ["o_orderkey"], num_buckets=8)
    write_bucketed(
        l.select("l_orderkey", "l_extendedprice"), tl, ["l_orderkey"], num_buckets=8
    )
    ob, lb = spark.table(to), spark.table(tl)
    return (
        ob.join(lb, ob["o_orderkey"] == lb["l_orderkey"])
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("decimal(28,4)")
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderkey")
    )
