"""TPC-H analogs, part 3: Q2/Q11/Q20 — the suite's remaining shapes.

With these the full 22-query TPC-H surface is registered (q1-q22). The
synthetic schema has no partsupp (TESTDATA.md), so the three queries that
are partsupp-centric in the spec are adapted while keeping their defining
plan shapes:

- Q2  — correlated scalar-MIN subquery per group (min-cost supplier);
  "supply cost" is the supplier's best observed net price for the part.
- Q11 — scalar aggregate subquery inside HAVING (share-of-total filter).
- Q20 — nested IN-subqueries (parts by name → suppliers by shipped
  volume → supplier detail).

Decimal-exact money math per compat.py; dims broadcast; one big shuffle
per query (the lineitem aggregate on its group key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .compat import dec
from .registry import register

_OFFER_SQL = (
    "CAST(MIN(CAST(l.l_extendedprice AS DECIMAL(18,4))"
    " * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4))"
)
_VALUE_SQL = (
    "CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))"
    " * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4))"
)


@register(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH europe_offers AS (
        SELECT l.l_partkey, l.l_suppkey, s.s_acctbal, s.s_name, n.n_name,
               {_OFFER_SQL} AS offer_cost
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
        GROUP BY 1, 2, 3, 4, 5
    )
    SELECT o.s_acctbal, o.s_name, o.n_name, o.l_partkey AS p_partkey,
           p.p_name, CAST(o.offer_cost AS DOUBLE) AS supply_cost
    FROM europe_offers o
    JOIN part p ON p.p_partkey = o.l_partkey
    WHERE p.p_size = 5 AND p.p_type = 'STANDARD'
      AND o.offer_cost = (SELECT MIN(i.offer_cost) FROM europe_offers i
                          WHERE i.l_partkey = o.l_partkey)
    ORDER BY o.s_acctbal DESC, o.n_name, o.s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog (no partsupp → a supplier's "supply cost" for a part
    is its best observed net sale price): for each STANDARD size-5 part,
    the EUROPE supplier(s) matching the region-wide minimum cost.

    Plan shape: supplier/nation/region broadcast into the lineitem scan,
    one shuffle on (partkey, suppkey) for the offer aggregate, then the
    correlated MIN is a window over partkey on that (already small)
    aggregate — no second pass over lineitem, no self-join shuffle. The
    min of exact DECIMAL products keeps the equality comparison
    bit-stable across engines (no division anywhere)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 5) & (F.col("p_type") == "STANDARD")
    )
    europe_sup = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    offers = (
        li.join(F.broadcast(europe_sup), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey", "s_acctbal", "s_name", "n_name")
        .agg(
            F.min(dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount")))
            .cast("decimal(38,4)")
            .alias("offer_cost")
        )
    )
    best = F.min("offer_cost").over(Window.partitionBy("l_partkey"))
    return (
        offers.withColumn("_best", best)
        .filter(F.col("offer_cost") == F.col("_best"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            F.col("offer_cost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q11_important_parts",
    oracle=f"""
    WITH vals AS (
        SELECT l.l_partkey, {_VALUE_SQL} AS part_value
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE s.s_nationkey = 3
        GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM vals
    WHERE CAST(part_value AS DOUBLE) * 1000
          > (SELECT CAST(SUM(part_value) AS DOUBLE) FROM vals)
    ORDER BY part_value DESC, p_partkey
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog (no partsupp → a part's "inventory value" is its
    traded volume through NATION_3's suppliers): parts whose value exceeds
    0.1% of the nation-wide total — Q11's scalar-subquery-in-HAVING shape.

    The share threshold compares doubles derived from the same exact
    DECIMAL sums on both engines (deterministic conversion), never
    decimal×decimal at mismatched scales. The grand total is a 1-row
    aggregate of the (small) per-part aggregate, broadcast back — the
    corpus is scanned once."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)
    vals = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount")))
            .cast("decimal(38,4)")
            .alias("part_value")
        )
    )
    total = vals.agg(F.sum("part_value").cast("double").alias("_total"))
    return (
        vals.join(F.broadcast(total))
        .filter(F.col("part_value").cast("double") * 1000 > F.col("_total"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("part_value").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@register(
    "tpch_q20_part_promotion_suppliers",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_3', 'NATION_5', 'NATION_8')
      AND s.s_suppkey IN (
        SELECT l.l_suppkey FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'red%')
          AND l.l_shipdate >= TIMESTAMP '1995-01-01'
          AND l.l_shipdate < TIMESTAMP '1996-01-01'
        GROUP BY l.l_suppkey
        HAVING CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 100
      )
    ORDER BY s_name
    """,
)
def tpch_q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog (no partsupp availqty → the volume threshold is a
    constant): suppliers from three nations that shipped more than 100
    units of red parts during 1995 — Q20's nested-IN-subquery shape.
    (Three nations rather than the spec's one: the sf0.001 smoke dataset
    has 10 suppliers across 10 of the 25 nations, so any single-nation
    predicate is empty there.)

    Part filter broadcast-semi-joins into the lineitem scan (predicate +
    partition pruning reach parquet), the volume HAVING groups on
    suppkey (small), and the qualifying-supplier set broadcast-semi-joins
    into supplier. No shuffle touches lineitem except the suppkey
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_5", "NATION_8")
    )
    qualifying = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("_qty"))
        .filter(F.col("_qty") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(F.broadcast(qualifying), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
