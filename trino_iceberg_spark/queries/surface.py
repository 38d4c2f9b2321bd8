"""Reference SQL-surface queries (SURVEY.md §2.B, B1-B19).

Each query exercises one construct the reference exercises against Trino,
re-expressed on the driver's testdata tables in the DataFrame API, with a
DuckDB oracle. Cited reference locations are in each docstring.

Plans: projections/filters reach the parquet scan (PushedFilters /
ReadSchema — checked in tests/test_plans.py); aggregations are
partial-before-shuffle (whole-stage codegen HashAggregate pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table, work_dir
from .compat import davg_col, davg_sql, dsum_col, dsum_sql, isum_col, isum_sql
from .registry import register


@register(
    "b01_projection",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment AS segment
    FROM customer ORDER BY c_custkey LIMIT 100
    """,
)
def b01_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 projection + alias + ORDER BY + LIMIT (AthenaClientTests.cs:32,
    examples/AthenaVerification/Program.cs:35). Column pruning reaches the
    scan: ReadSchema lists exactly the three columns."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", F.col("c_mktsegment").alias("segment"))
        .orderBy("c_custkey")
        .limit(100)
    )


@register(
    "b02_filter_comparisons",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity >= 30 AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_returnflag = 'R'
    """,
)
def b02_filter_comparisons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 comparison predicates on numeric/string/timestamp
    (AthenaClientTests.cs:32,374; QueryScalarTests.cs:126). All three
    predicates push to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 30)
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "b03_empty_result",
    oracle="SELECT c_custkey, c_name FROM customer WHERE c_custkey > 999999999",
)
def b03_empty_result(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 empty-result semantics (AthenaClientTests.cs:56-61)."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") > 999999999)
        .select("c_custkey", "c_name")
    )


@register(
    "b04_sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey LIMIT 500
    """,
)
def b04_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 multi-key sort (AthenaClientTests.cs:32; TrinoAdoNetIntegrationTests.cs:117).
    Top-N: Catalyst turns ORDER BY + LIMIT into TakeOrderedAndProject — no
    full sort-shuffle of the table at scale."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(F.col("o_orderstatus"), F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(500)
    )


@register(
    "b05_count_star",
    oracle="SELECT COUNT(*) AS cnt FROM orders WHERE o_custkey >= 100",
)
def b05_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 COUNT(*) with filter (TrinoClientIntegrationTests.cs:55)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") >= 100)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "b06_sum",
    oracle=f"""
    SELECT {isum_sql('o_orderkey')} AS sum_keys, {dsum_sql('o_totalprice')} AS sum_price
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def b06_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 SUM over int and decimal-exact double (TrinoClientIntegrationTests.cs:70,
    QueryScalarTests.cs:110 — decimal sums must be exact, SURVEY.md known-hard)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .agg(isum_col("o_orderkey").alias("sum_keys"), dsum_col("o_totalprice").alias("sum_price"))
    )


@register(
    "b07_avg_cast",
    oracle="""
    SELECT CAST(AVG(CAST(c_custkey AS DOUBLE)) AS DOUBLE) AS avg_key,
           COUNT(*) AS cnt
    FROM customer WHERE c_nationkey < 10
    """,
)
def b07_avg_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7 AVG(CAST(x AS DOUBLE)) (TrinoClientIntegrationTests.cs:71-74).
    Integer-valued doubles sum exactly below 2^53, so plain AVG is
    deterministic here."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") < 10)
        .agg(
            F.avg(F.col("c_custkey").cast("double")).alias("avg_key"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "b08_min_max",
    oracle="""
    SELECT CAST(MIN(p_size) AS INTEGER) AS min_size,
           CAST(MAX(p_size) AS INTEGER) AS max_size,
           MIN(p_name) AS min_name, MAX(p_brand) AS max_brand
    FROM part
    """,
)
def b08_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 MIN/MAX over int and varchar (QueryScalarTests.cs:19,32,58 —
    string min is lexicographic in both engines)."""
    return load_table(spark, sf_dir, "part").agg(
        F.min("p_size").alias("min_size"),
        F.max("p_size").alias("max_size"),
        F.min("p_name").alias("min_name"),
        F.max("p_brand").alias("max_brand"),
    )


@register(
    "b09_groupby_agg_sort",
    oracle=f"""
    SELECT c_mktsegment AS category, COUNT(*) AS cnt,
           {dsum_sql('c_acctbal')} AS total_balance
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def b09_groupby_agg_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9 GROUP BY + aggregate + sort — the reference's flagship golden
    (TrinoClientIntegrationTests.cs:87-95). Partial aggregation happens
    map-side before the shuffle (HashAggregate pair in the plan)."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("category"))
        .agg(F.count(F.lit(1)).alias("cnt"), dsum_col("c_acctbal").alias("total_balance"))
        .orderBy("category")
    )


@register(
    "b10_scalar_literals",
    oracle="""
    SELECT 1 AS id, 'Test User' AS name, TRUE AS is_active,
           CAST(42.5 AS DOUBLE) AS score
    """,
)
def b10_scalar_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10 literal-only SELECT, no FROM (examples/AthenaVerification/Program.cs:35)."""
    return spark.sql(
        "SELECT 1 AS id, 'Test User' AS name, TRUE AS is_active, CAST(42.5 AS DOUBLE) AS score"
    )


@register(
    "b11_concat",
    oracle="""
    SELECT r_regionkey, 'region:' || r_name || '/' || CAST(r_regionkey AS VARCHAR) AS tag
    FROM region ORDER BY r_regionkey
    """,
)
def b11_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11 string concatenation with || (validate.sh:10)."""
    return (
        load_table(spark, sf_dir, "region")
        .select(
            "r_regionkey",
            F.concat(
                F.lit("region:"), F.col("r_name"), F.lit("/"), F.col("r_regionkey").cast("string")
            ).alias("tag"),
        )
        .orderBy("r_regionkey")
    )


@register(
    "b12_string_escaping",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS cnt
    FROM orders
    WHERE o_orderpriority = '4-NOT SPECIFIED' OR o_orderpriority LIKE '%URGENT%'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def b12_string_escaping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12 quoted/escaped literals in predicates
    (TrinoClientIntegrationTests.cs:117-119)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderpriority") == "4-NOT SPECIFIED")
            | F.col("o_orderpriority").like("%URGENT%")
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("o_orderpriority")
    )


@register(
    "b13_case_arithmetic",
    oracle=f"""
    SELECT l_returnflag,
           {isum_sql("CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END")} AS big_qty_lines,
           {dsum_sql('l_extendedprice + l_tax')} AS price_plus_tax
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def b13_case_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN + column arithmetic (§2.C scalar surface)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            isum_col(F.when(F.col("l_quantity") > 25, 1).otherwise(0)).alias("big_qty_lines"),
            dsum_col(F.col("l_extendedprice") + F.col("l_tax")).alias("price_plus_tax"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "b14_cast_matrix",
    oracle="""
    SELECT o_orderkey,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_int,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(o_orderkey % 2 AS BOOLEAN) AS odd_key
    FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey
    """,
)
def b14_cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7/B14 CAST across types. Note double→bigint truncates toward zero in
    both engines."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 200)
        .select(
            "o_orderkey",
            # FLOOR on both sides: DuckDB rounds double→int casts, Spark
            # truncates — floor first makes them agree.
            F.floor("o_totalprice").cast("bigint").alias("price_int"),
            F.col("o_orderkey").cast("string").alias("key_str"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            (F.col("o_orderkey") % 2).cast("boolean").alias("odd_key"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "b15_null_handling",
    oracle="""
    SELECT n_nationkey,
           COALESCE(NULLIF(n_name, 'FRANCE'), '<redacted>') AS display_name,
           (NULLIF(n_regionkey, 0) IS NULL) AS in_region_zero
    FROM nation ORDER BY n_nationkey
    """,
)
def b15_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: NULLIF/COALESCE/IS NULL (reference exercises NULLs
    throughout — Scripts/insert/01-test-data.sql:3-7, QueryResultMapper nulls)."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.coalesce(F.nullif(F.col("n_name"), F.lit("FRANCE")), F.lit("<redacted>")).alias(
            "display_name"
        ),
        F.nullif(F.col("n_regionkey"), F.lit(0)).isNull().alias("in_region_zero"),
    ).orderBy("n_nationkey")


@register(
    "b16_in_between_like",
    oracle="""
    SELECT p_partkey, p_name, p_type, p_size
    FROM part
    WHERE p_type IN ('PROMO', 'ECONOMY') AND p_size BETWEEN 10 AND 30
      AND p_brand LIKE 'Brand#1%'
    ORDER BY p_partkey
    """,
)
def b16_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list, BETWEEN, LIKE predicates (§2.C scalar surface; all push down)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_type").isin("PROMO", "ECONOMY")
            & F.col("p_size").between(10, 30)
            & F.col("p_brand").like("Brand#1%")
        )
        .select("p_partkey", "p_name", "p_type", "p_size")
        .orderBy("p_partkey")
    )


@register(
    "b17_distinct",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority
    FROM orders ORDER BY o_orderstatus, o_orderpriority
    """,
)
def b17_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (§2.C). Implemented as groupBy under the hood — partial
    dedup map-side before the shuffle."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@register(
    "b18_limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def b18_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K: ORDER BY + LIMIT → TakeOrderedAndProject (no global sort)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@register(
    "b19_json_extraction",
    oracle="""
    SELECT event_type,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k,
           COUNT(*) AS cnt
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def b19_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: JSON property extraction from the events
    props column (§2.C scalar-fn surface; Spark get_json_object)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(F.min(k).alias("min_k"), F.max(k).alias("max_k"), F.count(F.lit(1)).alias("cnt"))
        .orderBy("event_type")
    )


@register(
    "f09_edit_distance",
    oracle="""
    SELECT a.doc_id,
           levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS edit_dist,
           CAST(length(a.text) AS INTEGER) AS len_a
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    WHERE a.doc_id < 100
    ORDER BY a.doc_id
    """,
)
def f09_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-distance functions: Levenshtein edit distance between
    adjacent documents' prefixes (the fuzzy-match primitive under record
    linkage). Self-join on consecutive ids — an equi-join, so it shuffles
    on the key instead of comparing all pairs."""
    d = load_table(spark, sf_dir, "documents")
    a = d.select("doc_id", F.substring("text", 1, 40).alias("_pa"),
                 F.length("text").alias("len_a"))
    b = d.select((F.col("doc_id") - 1).alias("doc_id"),
                 F.substring("text", 1, 40).alias("_pb"))
    return (
        a.filter(F.col("doc_id") < 100)
        .join(b, "doc_id")
        .select(
            "doc_id",
            F.levenshtein("_pa", "_pb").alias("edit_dist"),
            F.col("len_a").cast("int").alias("len_a"),
        )
        .orderBy("doc_id")
    )


@register(
    "b21_variant_extraction",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
           CAST(COUNT(json_extract(props, '$.k')) AS BIGINT) AS k_cnt
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def b21_variant_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (Spark 4): parse the JSON props
    column into a VARIANT once, extract typed fields with
    try_variant_get, and aggregate — the modern engine answer to
    schema-on-read JSON (binary-encoded variant beats per-row string
    re-parsing: one parse, many typed extractions). Oracle uses DuckDB's
    json_extract over the same column."""
    e = load_table(spark, sf_dir, "events")
    v = e.withColumn("_v", F.parse_json(F.col("props")))
    return (
        v.withColumn("k", F.try_variant_get("_v", "$.k", "int"))
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("long").alias("k_sum"),
            F.count("k").cast("long").alias("k_cnt"),
        )
        .orderBy("event_type")
    )


@register(
    "b22_group_by_all",
    oracle="""
    SELECT n_regionkey, SUBSTR(n_name, 1, 1) AS initial,
           COUNT(*) AS cnt, CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
    FROM nation
    GROUP BY ALL ORDER BY ALL
    """,
)
def b22_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL shorthand (Spark 3.4+ SQL text, same
    dialect DuckDB pioneered): every non-aggregate select item becomes a
    grouping key, and the sort covers the full select list — checked
    against DuckDB running the literal same shorthand."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("b22_nation")
    return spark.sql(
        """
        SELECT n_regionkey, SUBSTR(n_name, 1, 1) AS initial,
               COUNT(*) AS cnt, CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
        FROM b22_nation
        GROUP BY ALL ORDER BY ALL
        """
    )


@register(
    "b23_qualify",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey <= 200
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 3
    ORDER BY o_custkey, o_totalprice DESC, o_orderkey
    """,
)
def b23_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``QUALIFY`` window-filter clause (DuckDB/Snowflake/BigQuery syntax;
    Trino and Spark both lack it) served by the client's SQL-text rewrite
    (timetravel_sql.rewrite_qualify → nested * EXCEPT projection): top-3
    orders per customer without a hand-written subquery. The oracle is
    DuckDB running the LITERAL same QUALIFY statement natively — the
    rewrite is correct iff it matches the native implementation. Rewrite
    mechanics (alias predicates, LIMIT tails, literals, subquery
    non-rewrites) are pinned in tests/test_timetravel_sql.py."""
    from ..client import AthenaSparkClient

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return AthenaSparkClient(spark).sql_df(
        """
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey <= 200
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 3
        ORDER BY o_custkey, o_totalprice DESC, o_orderkey
        """
    )


@register(
    "a11_unload_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderkey <= 1500
    ORDER BY o_orderkey
    """,
)
def a11_unload_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNLOAD round trip through the driver gate (A3 — the reference's
    core export path, AthenaClient.cs:116-208): query → flat parquet
    files at the exact bucket/path via the fs client, then read the
    exported files back. Hash-equality with the source query proves the
    export is lossless END TO END (flat layout, no metadata droppings,
    Observation row count, temp cleanup), complementing the pytest
    contract suite with a value-level driver verdict."""
    import os

    from ..client import AthenaSparkClient
    from ..fs import FsClient

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("a11_orders")
    root = work_dir("a11_unload")
    fs = FsClient(root=root, bucket="exports")
    fs.create_bucket()
    client = AthenaSparkClient(spark, fs_client=fs)
    resp = client.unload(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM a11_orders WHERE o_orderkey <= 1500
        """,
        path="roundtrip",
    )
    if resp.row_count <= 0:  # Observation-counted on the same pass
        raise RuntimeError("UNLOAD reported zero rows")
    return spark.read.parquet(resp.output_path).orderBy("o_orderkey")


@register(
    "io01_format_roundtrip",
    oracle="""
    SELECT 'csv' AS fmt, COUNT(*) AS cnt,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS price_sum
    FROM orders WHERE o_orderkey <= 2000
    UNION ALL
    SELECT 'json', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT),
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
    FROM orders WHERE o_orderkey <= 2000
    UNION ALL
    SELECT 'orc', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT),
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
    FROM orders WHERE o_orderkey <= 2000
    ORDER BY fmt
    """,
)
def io01_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-parquet source/sink surface (sources.formats.read_source /
    write_sink): the same rows exported to CSV and JSON and read back
    SCHEMA-EXPLICIT (inference is opt-in only — an inference pass over
    100 TB is a full extra scan, so the reader refuses csv/json without a
    schema) plus ORC (self-describing, schema passed for symmetry), then
    aggregated per format. Hash-equality of all rows with the
    parquet-sourced oracle proves each format round-trips the types
    losslessly; sums go through exact DECIMAL so the text→double parse is
    the only float step on both sides."""
    import os

    from ..sources.formats import read_source, write_sink

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select("o_orderkey", "o_totalprice")
    )
    root = work_dir("io01")
    schema = "o_orderkey long, o_totalprice double"
    pieces = []
    for fmt in ("csv", "json", "orc"):
        path = os.path.join(root, fmt)
        write_sink(o, path, fmt=fmt, mode="overwrite")
        back = read_source(spark, path, fmt=fmt, schema=schema)
        pieces.append(
            back.agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("o_orderkey").cast("long").alias("key_sum"),
                F.round(
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"),
                    2,
                ).alias("price_sum"),
            ).select(F.lit(fmt).alias("fmt"), "cnt", "key_sum", "price_sum")
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.orderBy("fmt")


@register(
    "b24_fetch_first_offset",
    oracle="""
    WITH page AS (
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 20 OFFSET 10
    ),
    capped AS (
        SELECT c_custkey FROM customer ORDER BY c_custkey
        LIMIT 5
    )
    SELECT p.c_custkey, p.c_name, p.c_acctbal,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM capped) AS capped_n
    FROM page p
    ORDER BY p.c_acctbal DESC, p.c_custkey
    """,
)
def b24_fetch_first_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trino's ANSI row-limiting dialect (round 14 —
    formatting.rewrite_trino_limits): ``OFFSET n ROWS FETCH NEXT m ROWS
    ONLY`` pagination and ``FETCH FIRST n ROWS ONLY``, neither of which
    Spark parses, rewritten textually (quote/comment-masked, purely
    enabling) into Spark's ``LIMIT m OFFSET n``. The plan is still
    Spark's TakeOrderedAndProject — the rewrite changes spelling, never
    shape. Oracle states the same pagination with DuckDB's LIMIT/OFFSET."""
    from ..client import AthenaSparkClient

    load_table(spark, sf_dir, "customer").createOrReplaceTempView("b24_customer")
    client = AthenaSparkClient(spark)
    return client.sql_df(
        """
        WITH page AS (
            SELECT c_custkey, c_name, c_acctbal
            FROM b24_customer
            ORDER BY c_acctbal DESC, c_custkey
            OFFSET 10 ROWS FETCH NEXT 20 ROWS ONLY
        ),
        capped AS (
            SELECT c_custkey FROM b24_customer ORDER BY c_custkey
            FETCH FIRST 5 ROWS ONLY
        )
        SELECT p.c_custkey, p.c_name, p.c_acctbal,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM capped) AS capped_n
        FROM page p
        ORDER BY p.c_acctbal DESC, p.c_custkey
        """
    )
