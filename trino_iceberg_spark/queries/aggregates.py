"""Advanced aggregation surface (SURVEY.md §2.C: DISTINCT aggregation,
HAVING, ROLLUP/CUBE/GROUPING SETS, set operations, CTEs, subqueries,
pivot-style conditional aggregation, exact variance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .compat import dec, dsum_col, dsum_sql, isum_col, isum_sql
from .registry import register


@register(
    "a01_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS suppliers,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS parts,
           COUNT(*) AS line_cnt
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def a01_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate — Catalyst plans an expand
    + two-phase aggregate; exact, unlike approx_count_distinct (which the
    engine also exposes for the 100 TB path — see a07)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("suppliers"),
            F.countDistinct("l_partkey").alias("parts"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "a02_having",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS order_cnt, {dsum_sql('o_totalprice')} AS spend
    FROM orders GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    ORDER BY o_custkey
    """,
)
def a02_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING (post-aggregation filter)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_cnt"), dsum_col("o_totalprice").alias("spend"))
        .filter(F.col("order_cnt") >= 15)
        .orderBy("o_custkey")
    )


@register(
    "a03_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
           {dsum_sql('o_totalprice')} AS revenue
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def a03_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals + grand total."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum_col("o_totalprice").alias("revenue"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first()
        )
    )


@register(
    "a04_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def a04_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@register(
    "a05_grouping_sets",
    oracle=f"""
    SELECT n_regionkey, c_mktsegment, COUNT(*) AS cnt
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_regionkey), (c_mktsegment))
    ORDER BY n_regionkey NULLS FIRST, c_mktsegment NULLS FIRST
    """,
)
def a05_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS over a dim join (SQL API — identical plan to
    the DataFrame cube/rollup path)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_gs_customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("_gs_nation")
    return spark.sql(
        """
        SELECT n_regionkey, c_mktsegment, COUNT(*) AS cnt
        FROM _gs_customer JOIN _gs_nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_regionkey), (c_mktsegment))
        ORDER BY n_regionkey NULLS FIRST, c_mktsegment NULLS FIRST
        """
    )


@register(
    "a06_pivot_conditional",
    oracle=f"""
    SELECT l_returnflag,
           {isum_sql("CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END")} AS status_o,
           {isum_sql("CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END")} AS status_f,
           {dsum_sql("CASE WHEN l_linestatus = 'O' THEN l_extendedprice ELSE 0 END")} AS revenue_o,
           {dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_extendedprice ELSE 0 END")} AS revenue_f
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def a06_pivot_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot via DataFrame ``.pivot`` with explicit values (no extra pass to
    discover them — required at scale); oracle is the equivalent
    conditional aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(dec("l_extendedprice")).cast("double").alias("rev"),
        )
    )
    return pivoted.select(
        "l_returnflag",
        F.coalesce(F.col("O_cnt"), F.lit(0)).cast("long").alias("status_o"),
        F.coalesce(F.col("F_cnt"), F.lit(0)).cast("long").alias("status_f"),
        F.coalesce(F.col("O_rev"), F.lit(0.0)).alias("revenue_o"),
        F.coalesce(F.col("F_rev"), F.lit(0.0)).alias("revenue_f"),
    ).orderBy("l_returnflag")


@register(
    "a07_approx_and_exact_stats",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(o_custkey AS BIGINT) * CAST(o_custkey AS BIGINT)) AS BIGINT) AS sum_key_sq
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def a07_approx_and_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct + integer moment sums (the building blocks for exact
    cross-engine variance — float stddev differs across engines, so variance
    is derived from exact integer sums instead; see test_operators for the
    derived check). approx_count_distinct is exposed via operators.sketches."""
    o = load_table(spark, sf_dir, "orders")
    key = F.col("o_custkey").cast("long")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("exact_customers"),
            F.count(F.lit(1)).alias("cnt"),
            F.sum(key * key).cast("long").alias("sum_key_sq"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "s01_union_all",
    oracle="""
    SELECT k, name, src FROM (
        SELECT c_custkey AS k, c_name AS name, 'customer' AS src FROM customer WHERE c_custkey <= 50
        UNION ALL
        SELECT s_suppkey AS k, s_name AS name, 'supplier' AS src FROM supplier WHERE s_suppkey <= 50
    ) ORDER BY src, k
    """,
)
def s01_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two heterogeneous sources unified to one schema."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 50)
        .select(F.col("c_custkey").alias("k"), F.col("c_name").alias("name"), F.lit("customer").alias("src"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 50)
        .select(F.col("s_suppkey").alias("k"), F.col("s_name").alias("name"), F.lit("supplier").alias("src"))
    )
    return c.unionAll(s).orderBy("src", "k")


@register(
    "s02_union_distinct",
    oracle="""
    SELECT k FROM (
        SELECT c_nationkey AS k FROM customer
        UNION
        SELECT s_nationkey AS k FROM supplier
    ) ORDER BY k
    """,
)
def s02_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — dedup across sources."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.union(s).distinct().orderBy("k")


@register(
    "s03_intersect",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY k
    """,
)
def s03_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (nations having both customers and suppliers)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s).orderBy("k")


@register(
    "s04_except",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    ORDER BY k
    """,
)
def s04_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (nations with customers but no suppliers). ``subtract`` is
    set-EXCEPT (distinct); ``exceptAll`` would be bag semantics."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.subtract(s).orderBy("k")


@register(
    "c01_cte",
    oracle=f"""
    WITH nation_orders AS (
        SELECT n.n_name, o.o_totalprice
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT n_name, COUNT(*) AS order_cnt, {dsum_sql('o_totalprice')} AS revenue
    FROM nation_orders GROUP BY n_name ORDER BY n_name
    """,
)
def c01_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE (WITH) via the SQL API over registered views."""
    for t in ("orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"_cte_{t}")
    return spark.sql(
        f"""
        WITH nation_orders AS (
            SELECT n.n_name, o.o_totalprice
            FROM _cte_orders o
            JOIN _cte_customer c ON o.o_custkey = c.c_custkey
            JOIN _cte_nation n ON c.c_nationkey = n.n_nationkey
        )
        SELECT n_name, COUNT(*) AS order_cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM nation_orders GROUP BY n_name ORDER BY n_name
        """
    )


@register(
    "c02_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) * 2
                          FROM orders)
    ORDER BY o_orderkey
    """,
)
def c02_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (orders > 2× average price).

    The decimal AVG is exact, and the comparison threshold is identical in
    both engines, so the selected set matches exactly."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_sq_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM _sq_orders
        WHERE o_totalprice > (SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) * 2
                              FROM _sq_orders)
        ORDER BY o_orderkey
        """
    )


@register(
    "c03_in_subquery",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
    ORDER BY s_suppkey
    """,
)
def c03_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) — planned as a left-semi join."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("_in_supplier")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("_in_nation")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM _in_supplier
        WHERE s_nationkey IN (SELECT n_nationkey FROM _in_nation WHERE n_regionkey = 0)
        ORDER BY s_suppkey
        """
    )


@register(
    "f01_string_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS upper_name,
           LOWER(p_brand) AS lower_brand,
           CAST(LENGTH(p_name) AS INTEGER) AS name_len,
           SUBSTR(p_name, 1, 5) AS name_prefix,
           REPLACE(p_type, 'PROMO', 'PROMOTIONAL') AS long_type,
           TRIM('  ' || p_brand || ' ') AS trimmed,
           CAST(STRPOS(p_name, 'a') AS INTEGER) AS first_a
    FROM part WHERE p_partkey <= 100 ORDER BY p_partkey
    """,
)
def f01_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string library: upper/lower/length/substr/replace/trim/instr
    (§2.C — Spark's function library supersets the exercised Trino surface)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("upper_name"),
        F.lower("p_brand").alias("lower_brand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit("PROMO"), F.lit("PROMOTIONAL")).alias("long_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
    ).orderBy("p_partkey")


@register(
    "f02_date_functions",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
           CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
           CAST(DAY(o_orderdate) AS INTEGER) AS order_day,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS due_ts,
           COUNT(*) AS cnt
    FROM orders WHERE o_orderkey <= 1000
    GROUP BY 1, 2, 3, 4, 5 ORDER BY 1, 2, 3
    """,
)
def f02_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time library: year/month/day, date_trunc, interval arithmetic."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return (
        o.select(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_ts"),
        )
        .groupBy("order_year", "order_month", "order_day", "month_start", "due_ts")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("order_year", "order_month", "order_day")
    )


@register(
    "f03_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS abs_disc,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           SQRT(l_quantity) AS qty_sqrt,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem WHERE l_orderkey <= 300 ORDER BY l_orderkey, l_linenumber
    """,
)
def f03_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math library: abs/ceil/floor/sqrt/mod/sign. sqrt is IEEE-exact so it
    cross-checks bit-identically; transcendentals (ln/exp) are deliberately
    not hash-gated (libm differs across engines)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "f04_conditional_functions",
    oracle="""
    SELECT s_suppkey,
           GREATEST(s_acctbal, 0.0) AS pos_balance,
           LEAST(CAST(s_nationkey AS INTEGER), 10) AS capped_nation,
           CASE WHEN s_acctbal < 0 THEN 'debt'
                WHEN s_acctbal < 5000 THEN 'low' ELSE 'high' END AS balance_band,
           IFNULL(NULLIF(s_name, ''), '<unnamed>') AS safe_name
    FROM supplier ORDER BY s_suppkey
    """,
)
def f04_conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional library: greatest/least/multi-branch CASE/ifnull."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.greatest(F.col("s_acctbal"), F.lit(0.0)).alias("pos_balance"),
        F.least(F.col("s_nationkey").cast("int"), F.lit(10)).alias("capped_nation"),
        F.when(F.col("s_acctbal") < 0, "debt")
        .when(F.col("s_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("balance_band"),
        F.ifnull(F.nullif(F.col("s_name"), F.lit("")), F.lit("<unnamed>")).alias("safe_name"),
    ).orderBy("s_suppkey")


@register(
    "f05_hash_functions",
    oracle="""
    SELECT doc_id, MD5(text) AS text_md5, CAST(LENGTH(text) AS BIGINT) AS text_len
    FROM documents WHERE doc_id < 100 ORDER BY doc_id
    """,
)
def f05_hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MD5 content hashing — identical hex digests across engines; the
    foundation of exact dedup (operators.dedup.exact_dedup)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
        F.length("text").cast("long").alias("text_len"),
    ).orderBy("doc_id")


@register(
    "a08_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS p50,
           quantile_cont(l_quantity, 0.9) AS p90,
           quantile_cont(l_quantity, 0.99) AS p99
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def a08_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation at index p·(n-1) — the same
    formula in Spark's percentile and DuckDB's quantile_cont, so values
    hash-match exactly). percentile_approx is the 100 TB scale path; the
    exact form is the correctness anchor it is tested against."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("p50"),
            F.expr("percentile(l_quantity, 0.9)").alias("p90"),
            F.expr("percentile(l_quantity, 0.99)").alias("p99"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "f06_regex_functions",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           regexp_replace(p_brand, '[0-9]+', '#', 'g') AS brand_masked,
           CASE WHEN regexp_matches(p_type, '^(PROMO|STANDARD)$') THEN 1 ELSE 0 END AS is_common_type
    FROM part WHERE p_partkey <= 200 ORDER BY p_partkey
    """,
)
def f06_regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface: extract / global replace / full-match test — all
    map-side projections on the pruned scan."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_brand", "[0-9]+", "#").alias("brand_masked"),
        F.when(F.col("p_type").rlike("^(PROMO|STANDARD)$"), 1)
        .otherwise(0)
        .alias("is_common_type"),
    ).orderBy("p_partkey")


@register(
    "f07_array_functions",
    oracle="""
    SELECT p_partkey,
           CAST(list_sum(range(1, (p_size % 5) + 2)) AS BIGINT) AS seq_sum,
           len(range(1, (p_size % 5) + 2)) AS seq_len,
           CAST(list_contains(range(1, (p_size % 5) + 2), 3) AS INTEGER) AS has_three,
           CAST(list_max([p_size, CAST(p_partkey % 37 AS INTEGER), 7]) AS INTEGER) AS arr_max
    FROM part WHERE p_partkey <= 100 ORDER BY p_partkey
    """,
)
def f07_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface: sequence construction, fold-sum, size, membership,
    array_max — all codegen'd projections (DuckDB range(a,b) is half-open;
    Spark sequence(a,b) inclusive, hence the bound adjustment)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    seq = F.sequence(F.lit(1), (F.col("p_size") % 5) + 1)
    return p.select(
        "p_partkey",
        F.aggregate(seq, F.lit(0).cast("long"), lambda a, x: a + x).alias("seq_sum"),
        F.size(seq).cast("long").alias("seq_len"),
        F.array_contains(seq, 3).cast("int").alias("has_three"),
        F.array_max(
            F.array(
                F.col("p_size"),
                (F.col("p_partkey") % 37).cast("int"),
                F.lit(7),
            )
        ).cast("int").alias("arr_max"),
    ).orderBy("p_partkey")


@register(
    "f08_map_functions",
    oracle="""
    SELECT o_orderstatus,
           CAST(map {'count': cnt, 'keys': ks}['count'][1] AS BIGINT) AS from_map_count,
           CAST(map {'count': cnt, 'keys': ks}['keys'][1] AS BIGINT) AS from_map_keys
    FROM (
        SELECT o_orderstatus, COUNT(*) AS cnt, COUNT(DISTINCT o_custkey) AS ks
        FROM orders GROUP BY o_orderstatus
    ) ORDER BY o_orderstatus
    """,
)
def f08_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map surface: construct a map from computed values, extract by key —
    round-trips the aggregate through MapType."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count_distinct("o_custkey").alias("ks"),
    )
    m = F.create_map(
        F.lit("count"), F.col("cnt"), F.lit("keys"), F.col("ks")
    )
    return agg.select(
        "o_orderstatus",
        m.getItem("count").cast("long").alias("from_map_count"),
        m.getItem("keys").cast("long").alias("from_map_keys"),
    ).orderBy("o_orderstatus")


@register(
    "a09_unpivot",
    oracle="""
    SELECT o_orderstatus, metric, CAST(value AS DOUBLE) AS value
    FROM (
        SELECT o_orderstatus,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS total_price,
               CAST(COUNT(*) AS DOUBLE) AS order_count,
               CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS customers
        FROM orders GROUP BY o_orderstatus
    ) UNPIVOT (value FOR metric IN (total_price, order_count, customers))
    ORDER BY o_orderstatus, metric
    """,
)
def a09_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide metrics → long key/value rows) — the inverse of a06's
    pivot. Spark's ``DataFrame.unpivot`` maps 1:1 to SQL UNPIVOT; the wide
    aggregate computes once, the melt is a per-row expression (no extra
    shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderstatus").agg(
        dsum_col("o_totalprice").alias("total_price"),
        F.count(F.lit(1)).cast("double").alias("order_count"),
        F.countDistinct("o_custkey").cast("double").alias("customers"),
    )
    return wide.unpivot(
        ["o_orderstatus"],
        ["total_price", "order_count", "customers"],
        "metric",
        "value",
    ).orderBy("o_orderstatus", "metric")


@register(
    "a10_grouping_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           COUNT(*) AS cnt
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def a10_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() indicator columns on a ROLLUP — the only way consumers
    can distinguish a real NULL group from a super-aggregate row (the
    SQL-standard companion to rollup/cube that a04/a05 exercise without).
    Same one-Expand-one-aggregate plan shape as any rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "cnt")
        .orderBy(
            "g_flag",
            "g_status",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


_RECURSIVE_CHAIN_SQL = """
WITH RECURSIVE chain(n_regionkey, n_nationkey, depth) AS (
    SELECT n_regionkey, MIN(n_nationkey), 1
    FROM nation GROUP BY n_regionkey
    UNION ALL
    SELECT c.n_regionkey,
           (SELECT MIN(n.n_nationkey) FROM nation n
            WHERE n.n_regionkey = c.n_regionkey
              AND n.n_nationkey > c.n_nationkey),
           c.depth + 1
    FROM chain c
    WHERE EXISTS (SELECT 1 FROM nation n
                  WHERE n.n_regionkey = c.n_regionkey
                    AND n.n_nationkey > c.n_nationkey)
)
SELECT n_regionkey, n_nationkey, depth
FROM chain ORDER BY n_regionkey, depth
"""


@register("c04_recursive_cte", oracle=_RECURSIVE_CHAIN_SQL)
def c04_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (new in Spark 4): walk each region's nation chain in
    key order, counting depth — the iterative successor traversal that
    only a recursive CTE expresses in pure SQL. The IDENTICAL statement
    runs on Spark and DuckDB (both ANSI recursive CTEs), so the hash
    match pins Spark's recursion semantics end to end. Recursion depth is
    bounded by the longest per-region chain (≤ nations-per-region), not
    data volume — each iteration is an ordinary joined step."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(_RECURSIVE_CHAIN_SQL)


@register(
    "b20_lateral_explode",
    oracle="""
    SELECT doc_id,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
    FROM documents WHERE doc_id < 5
    ORDER BY doc_id, tok
    """,
)
def b20_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating function in SQL text — ``LATERAL VIEW explode``
    (HiveQL's UNNEST spelling, the SQL-surface twin of every DataFrame
    explode in the pipeline operators)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("b20_documents")
    return spark.sql(
        "SELECT doc_id, tok FROM b20_documents "
        "LATERAL VIEW explode(filter(split(text, ' '), x -> x != '')) t AS tok "
        "WHERE doc_id < 5 ORDER BY doc_id, tok"
    )


@register(
    "s05_set_ops_all",
    oracle="""
    WITH i AS (
        SELECT c_nationkey AS k FROM customer WHERE c_custkey <= 200
        INTERSECT ALL
        SELECT s_nationkey FROM supplier
    ),
    e AS (
        SELECT c_nationkey AS k FROM customer WHERE c_custkey <= 200
        EXCEPT ALL
        SELECT s_nationkey FROM supplier
    )
    SELECT 'intersect_all' AS op, k, COUNT(*) AS cnt FROM i GROUP BY k
    UNION ALL
    SELECT 'except_all', k, COUNT(*) FROM e GROUP BY k
    ORDER BY op, k
    """,
)
def s05_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations — INTERSECT ALL / EXCEPT ALL
    (``intersectAll``/``exceptAll``): multiplicity-preserving, the
    variants s03/s04 deliberately don't exercise. Summarized by value so
    the duplicate COUNTS are what the oracle hash pins."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200).select(
        F.col("c_nationkey").alias("k")
    )
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    i = c.intersectAll(s).groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).select(
        F.lit("intersect_all").alias("op"), "k", "cnt"
    )
    e = c.exceptAll(s).groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).select(
        F.lit("except_all").alias("op"), "k", "cnt"
    )
    return i.unionByName(e).orderBy("op", "k")


@register(
    "f10_bitwise_functions",
    oracle="""
    SELECT l_linenumber,
           CAST(BIT_AND(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_and,
           CAST(BIT_OR(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_or,
           CAST(BIT_XOR(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_xor,
           CAST(MIN(CAST(l_quantity AS BIGINT) << 2) AS BIGINT) AS min_shl,
           CAST(MAX(CAST(l_quantity AS BIGINT) >> 1) AS BIGINT) AS max_shr
    FROM lineitem WHERE l_orderkey <= 500
    GROUP BY l_linenumber ORDER BY l_linenumber
    """,
)
def f10_bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate + scalar surface: BIT_AND/BIT_OR/BIT_XOR
    aggregates and shift operators — the last scalar-function family the
    f-matrix didn't cover."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    q = F.col("l_quantity").cast("long")
    return (
        li.groupBy("l_linenumber")
        .agg(
            F.bit_and(q).alias("qty_and"),
            F.bit_or(q).alias("qty_or"),
            F.bit_xor(q).alias("qty_xor"),
            F.min(F.shiftleft(q, 2).cast("long")).alias("min_shl"),
            F.max(F.shiftright(q, 1).cast("long")).alias("max_shr"),
        )
        .orderBy("l_linenumber")
    )


@register(
    "f11_string_functions2",
    oracle="""
    SELECT p_partkey,
           translate(p_name, 'aeiou', '12345') AS translated,
           left(p_name, 4) AS l4,
           right(p_name, 4) AS r4,
           repeat(p_brand, 2) AS doubled,
           reverse(p_type) AS reversed_type,
           lpad(p_brand, 15, '*') AS padded_l,
           rpad(p_brand, 15, '.') AS padded_r,
           CAST(ascii(p_name) AS INTEGER) AS first_code,
           split_part(p_type, ' ', 2) AS type_mid
    FROM part WHERE p_partkey <= 100 ORDER BY p_partkey
    """,
)
def f11_string_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second scalar-string battery: translate/left/right/repeat/reverse/
    lpad/rpad/ascii/split_part — byte-identical semantics on both engines
    over the ASCII part names."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey",
        F.translate("p_name", "aeiou", "12345").alias("translated"),
        F.substring("p_name", 1, 4).alias("l4"),
        F.expr("right(p_name, 4)").alias("r4"),
        F.repeat(F.col("p_brand"), 2).alias("doubled"),
        F.reverse("p_type").alias("reversed_type"),
        F.lpad("p_brand", 15, "*").alias("padded_l"),
        F.rpad("p_brand", 15, ".").alias("padded_r"),
        F.ascii("p_name").alias("first_code"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(2)).alias("type_mid"),
    ).orderBy("p_partkey")
