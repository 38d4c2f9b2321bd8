"""Client API parity tests — the reference's golden assertions, ported.

Sources: AthenaClientTests.cs, QueryScalarTests.cs,
TrinoClientIntegrationTests.cs, TrinoAdoNetIntegrationTests.cs (see
SURVEY.md §5 and FIXTURES.md for the exact goldens).
"""

from __future__ import annotations

import dataclasses
import datetime as dt
import uuid
from decimal import Decimal
from typing import Optional

import pytest

from trino_iceberg_spark.client import AthenaSparkClient
from trino_iceberg_spark.errors import QueryError
from trino_iceberg_spark.mapping import MappingError


@dataclasses.dataclass
class SharedData:
    id: int
    name: Optional[str]
    age: Optional[int]
    active: Optional[bool]


@dataclasses.dataclass
class Employee:
    employee_id: int
    first_name: str
    last_name: str
    hire_date: dt.date


@pytest.fixture()
def client(spark):
    return AthenaSparkClient(spark)


# --- A1 typed query (AthenaClientTests.cs:25-62) -------------------------


def test_typed_query_maps_rows(client):
    rows = client.query_typed(
        SharedData,
        "SELECT id, name, age, active FROM common_test_data.shared_data WHERE id <= 3 ORDER BY id",
    )
    assert [r.id for r in rows] == [1, 2, 3]
    assert rows[0] == SharedData(1, "Alice", 30, True)
    assert rows[1].active is False
    assert rows[2].name == "Charlie"


def test_empty_result(client):
    rows = client.query_typed(
        SharedData,
        "SELECT id, name, age, active FROM common_test_data.shared_data WHERE id > 999",
    )
    assert rows == []


def test_snake_case_binding(client):
    rows = client.query_typed(
        Employee,
        "SELECT employee_id, first_name, last_name, hire_date FROM common_test_data.employee_data ORDER BY employee_id",
    )
    assert rows[0].first_name == "John"
    assert rows[1].hire_date == dt.date(2019, 3, 22)


def test_null_fields(client):
    rows = client.query(
        "SELECT email, phone FROM common_test_data.shared_data WHERE id IN (2, 3) ORDER BY id"
    )
    assert rows[0]["email"] is None  # Bob
    assert rows[1]["phone"] is None  # Charlie


def test_numeric_extremes(client):
    row = client.query(
        "SELECT value_int, value_double, value_decimal FROM common_test_data.shared_data WHERE id = 100"
    )[0]
    assert row["value_int"] == 9223372036854775807
    assert row["value_double"] == pytest.approx(3.14159)
    assert row["value_decimal"] == Decimal("99.99")


# --- A4/A5 parameterization (AthenaClientTests.cs:64-96) -----------------


def test_parameterized_string_with_quotes(client):
    rows = client.query(
        "SELECT id FROM common_test_data.shared_data WHERE content = {0}", "It's a test"
    )
    assert [r["id"] for r in rows] == [2]


def test_parameterized_timestamp_lookbehind(client):
    # TIMESTAMP keyword + datetime arg must not double the keyword
    val = client.query_scalar(
        "SELECT count(*) FROM common_test_data.scalar_test WHERE datetime_value < TIMESTAMP {0}",
        dt.datetime(2024, 2, 1),
    )
    assert val == 1


# --- A2 scalar matrix (QueryScalarTests.cs:14-132) -----------------------


def test_scalar_int(client):
    assert client.query_scalar("SELECT max(int_value) FROM common_test_data.scalar_test") == 30
    assert client.query_scalar("SELECT min(int_value) FROM common_test_data.scalar_test") == 10


def test_scalar_string(client):
    assert (
        client.query_scalar("SELECT min(string_value) FROM common_test_data.scalar_test")
        == "apple"
    )


def test_scalar_decimal_exact(client):
    v = client.query_scalar(
        "SELECT sum(decimal_value) FROM common_test_data.scalar_test", type_=Decimal
    )
    assert v == Decimal("351.00")
    assert isinstance(v, Decimal)


def test_scalar_null_returns_none(client):
    v = client.query_scalar(
        "SELECT max(int_value) FROM common_test_data.scalar_test WHERE id > 100"
    )
    assert v is None  # None, not 0 (AthenaClient.cs:77-86)


def test_scalar_no_rows_returns_none(client):
    v = client.query_scalar("SELECT int_value FROM common_test_data.scalar_test WHERE id > 100")
    assert v is None


def test_scalar_uuid(client):
    v = client.query_scalar(
        "SELECT guid_value FROM common_test_data.scalar_test WHERE id = 1", type_=uuid.UUID
    )
    assert v == uuid.UUID("a1b2c3d4-e5f6-7890-abcd-ef1234567890")


def test_scalar_bool_datetime(client):
    assert client.query_scalar(
        "SELECT bool_value FROM common_test_data.scalar_test WHERE id = 2"
    ) is False
    assert client.query_scalar(
        "SELECT datetime_value FROM common_test_data.scalar_test WHERE id = 1"
    ) == dt.datetime(2024, 1, 15, 10, 30)


def test_scalar_parameterized_sum(client):
    assert (
        client.query_scalar(
            "SELECT sum(int_value) FROM common_test_data.scalar_test WHERE category = {0}", "A"
        )
        == 30
    )


# --- raw queries (TrinoClientIntegrationTests.cs:49-123) -----------------


def test_count_filter(client):
    assert (
        client.query_scalar("SELECT COUNT(*) FROM common_test_data.shared_data WHERE id >= 100")
        == 2
    )


def test_sum_avg(client):
    assert (
        client.query_scalar("SELECT SUM(id) FROM common_test_data.shared_data WHERE id >= 100")
        == 300
    )
    assert client.query_scalar(
        "SELECT AVG(CAST(id AS DOUBLE)) FROM common_test_data.shared_data WHERE id >= 100"
    ) == pytest.approx(150.0)


def test_group_by_golden(client):
    rows = client.query(
        "SELECT category, SUM(amount) AS total FROM common_test_data.category_data "
        "GROUP BY category ORDER BY category"
    )
    assert [(r["category"], r["total"]) for r in rows] == [("A", 250), ("B", 500)]


def test_invalid_relation_raises(client):
    with pytest.raises(QueryError):
        client.query("SELECT * FROM nonexistent.invalid.table")


def test_missing_column_mapping_error(client):
    @dataclasses.dataclass
    class Wrong:
        nonexistent_col: str

    with pytest.raises(MappingError):
        client.query_typed(Wrong, "SELECT id FROM common_test_data.shared_data LIMIT 1")


# --- B10/B11 literals & concat ------------------------------------------


def test_scalar_literals_no_from(client):
    row = client.query("SELECT 1 as id, 'Test User' as name, true as is_active")[0]
    assert (row["id"], row["name"], row["is_active"]) == (1, "Test User", True)


def test_concat_version(client):
    v = client.query_scalar("SELECT 'Hello from Spark ' || version()")
    assert v.startswith("Hello from Spark ")


def test_iter_query_streams(client):
    it = client.iter_query("SELECT id FROM common_test_data.shared_data ORDER BY id")
    assert next(it)["id"] == 1


# --- A3 UNLOAD contract (AthenaClientTests.cs:98-345) --------------------


@pytest.fixture()
def fs_client(tmp_path):
    from trino_iceberg_spark.fs import FsClient

    return FsClient(str(tmp_path / "buckets"), "warehouse")


@pytest.fixture()
def fs_client_backed(spark, fs_client):
    return AthenaSparkClient(spark, fs_client)


def _parquet_files(dirpath):
    import glob
    import os

    return sorted(glob.glob(os.path.join(dirpath, "*")))


def test_unload_flat_layout_and_rowcount(fs_client_backed):
    resp = fs_client_backed.unload(
        "SELECT * FROM common_test_data.shared_data", path="exports/run1"
    )
    assert resp.row_count == 5
    files = _parquet_files(resp.output_path)
    assert files and all(f.endswith(".parquet") for f in files)
    # no data/, metadata/, _SUCCESS, or CRC droppings (AthenaClientTests.cs:158-169)
    assert not any("/data/" in f or "/metadata/" in f for f in files)


def test_unload_repeated_adds_files(fs_client_backed):
    r1 = fs_client_backed.unload(
        "SELECT * FROM common_test_data.category_data", path="exports/run2"
    )
    n1 = len(_parquet_files(r1.output_path))
    r2 = fs_client_backed.unload(
        "SELECT * FROM common_test_data.category_data", path="exports/run2"
    )
    assert len(_parquet_files(r2.output_path)) > n1  # S3-copy add semantics


def test_unload_temp_cleanup(fs_client_backed, fs_client):
    import os

    fs_client_backed.unload("SELECT 1 AS x", path="exports/run3")
    assert not os.path.exists(
        os.path.join(fs_client.bucket_dir(), "_unload_temp")
    )  # AthenaClientTests.cs:172-208


def test_unload_cross_bucket(fs_client_backed, fs_client):
    resp = fs_client_backed.unload(
        "SELECT 42 AS answer", bucket="otherbucket", path="exports/x"
    )
    assert "otherbucket" in resp.output_path
    assert _parquet_files(resp.output_path)


def test_unload_without_fs_client_raises(client):
    from trino_iceberg_spark.errors import UnloadError

    with pytest.raises(UnloadError):
        client.unload("SELECT 1 AS x", path="exports/y")


def test_unload_num_files_controls_shards(fs_client_backed):
    resp = fs_client_backed.unload(
        "SELECT * FROM common_test_data.shared_data",
        path="exports/sharded",
        num_files=1,
    )
    files = _parquet_files(resp.output_path)
    assert len(files) == 1
    assert resp.row_count == 5


def test_unload_roundtrip_readback(spark, fs_client_backed):
    resp = fs_client_backed.unload(
        "SELECT category, SUM(amount) AS total FROM common_test_data.category_data "
        "GROUP BY category",
        path="exports/agg",
    )
    back = spark.read.parquet(resp.output_path)
    got = {r["category"]: int(r["total"]) for r in back.collect()}
    assert got == {"A": 250, "B": 500}


def test_unload_csv_headerless_like_athena(spark, fs_client_backed):
    resp = fs_client_backed.unload(
        "SELECT id, name FROM common_test_data.shared_data ORDER BY id",
        path="exports/csv1",
        format="csv",
        num_files=1,
    )
    assert resp.row_count == 5
    files = _parquet_files(resp.output_path)
    assert len(files) == 1 and files[0].endswith(".csv")
    with open(files[0]) as fh:
        first = fh.readline().strip()
    assert not first.startswith("id,")  # Athena UNLOAD CSV emits no header
    back = spark.read.csv(resp.output_path)
    assert back.count() == 5


def test_unload_json_roundtrip(spark, fs_client_backed):
    resp = fs_client_backed.unload(
        "SELECT category, SUM(amount) AS total FROM common_test_data.category_data "
        "GROUP BY category",
        path="exports/json1",
        format="json",
    )
    files = _parquet_files(resp.output_path)
    assert files and all(f.endswith(".json") for f in files)
    back = spark.read.json(resp.output_path)
    got = {r["category"]: int(r["total"]) for r in back.collect()}
    assert got == {"A": 250, "B": 500}


def test_unload_csv_header_option_passthrough(spark, fs_client_backed):
    resp = fs_client_backed.unload(
        "SELECT id, name FROM common_test_data.shared_data",
        path="exports/csv2",
        format="csv",
        num_files=1,
        options={"header": "true"},
    )
    with open(_parquet_files(resp.output_path)[0]) as fh:
        assert fh.readline().strip() == "id,name"


# --- A8 batch execution (TrinoIcebergStack.cs:232-257) -------------------


def test_execute_batch_sequential_ordering(client, spark):
    spark.sql("DROP TABLE IF EXISTS common_test_data.batch_seq")
    client.execute_batch(
        [
            "CREATE TABLE common_test_data.batch_seq (x INT) USING parquet",
            "INSERT INTO common_test_data.batch_seq VALUES (1)",
            "INSERT INTO common_test_data.batch_seq VALUES (2)",
        ]
    )
    assert client.query_scalar("SELECT COUNT(*) FROM common_test_data.batch_seq") == 2
    spark.sql("DROP TABLE common_test_data.batch_seq")


def test_execute_batch_concurrent_independent_inserts(client, spark):
    """Reference semantics: parallel tasks over one connection
    (TrinoIcebergStack.cs:232-257) — 4 concurrent INSERTs to distinct
    tables, all visible afterwards."""
    names = [f"common_test_data.batch_c{i}" for i in range(4)]
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")
        spark.sql(f"CREATE TABLE {n} (x INT) USING parquet")
    client.execute_batch(
        [f"INSERT INTO {n} VALUES ({i}), ({i + 10})" for i, n in enumerate(names)],
        concurrency=4,
    )
    for i, n in enumerate(names):
        got = sorted(r[0] for r in client.query(f"SELECT x FROM {n}"))
        assert got == [i, i + 10]
        spark.sql(f"DROP TABLE {n}")


def test_execute_batch_concurrent_failure_propagates_after_settling(client, spark):
    spark.sql("DROP TABLE IF EXISTS common_test_data.batch_ok")
    spark.sql("CREATE TABLE common_test_data.batch_ok (x INT) USING parquet")
    with pytest.raises(QueryError):
        client.execute_batch(
            [
                "INSERT INTO common_test_data.batch_ok VALUES (7)",
                "INSERT INTO common_test_data.no_such_batch_table VALUES (1)",
            ],
            concurrency=2,
        )
    # The healthy statement still landed (Task.WhenAll settles all tasks).
    assert client.query_scalar("SELECT COUNT(*) FROM common_test_data.batch_ok") == 1
    spark.sql("DROP TABLE common_test_data.batch_ok")


def test_unload_partitioned_by_hive_layout(spark, fs_client_backed):
    resp = fs_client_backed.unload(
        "SELECT * FROM common_test_data.category_data",
        path="exports/part1",
        partitioned_by=["category"],
    )
    assert resp.row_count == 4
    import os

    subdirs = sorted(
        d for d in os.listdir(resp.output_path)
        if os.path.isdir(os.path.join(resp.output_path, d))
    )
    assert subdirs == ["category=A", "category=B"]  # hive key=value layout
    back = spark.read.parquet(resp.output_path)
    assert back.count() == 4
    # partition column recovered from the path, not stored in data files
    assert {r["category"] for r in back.collect()} == {"A", "B"}
    got = sorted((r["amount"], r["category"]) for r in back.collect())
    assert got == [(100, "A"), (150, "A"), (200, "B"), (300, "B")]


def test_query_pandas_and_arrow(client):
    pdf = client.query_pandas(
        "SELECT category, SUM(amount) AS total FROM common_test_data.category_data "
        "GROUP BY category ORDER BY category"
    )
    assert list(pdf["category"]) == ["A", "B"] and list(pdf["total"]) == [250, 500]
    tbl = client.query_arrow(
        "SELECT category, SUM(amount) AS total FROM common_test_data.category_data "
        "GROUP BY category ORDER BY category"
    )
    import pyarrow as pa

    assert isinstance(tbl, pa.Table)
    assert tbl.column("total").to_pylist() == [250, 500]


def test_raw_engine_errors_wrap_as_query_errors(client, spark, tmp_path):
    """Round-14 directive #4: A1's contract is TYPED errors carrying the
    statement — an unknown USING datasource (raw Py4JJavaError /
    SparkClassNotFoundException in Spark) and a CTAS location collision
    must both surface as QueryError, never as raw engine classes."""
    import uuid

    with pytest.raises(QueryError, match="(?i)data.source|nosuchformat"):
        client.execute(
            f"CREATE TABLE badfmt_{uuid.uuid4().hex[:8]} (a int) USING nosuchformat"
        )
    # ctas(): second create at the same name/location refuses, typed
    name = f"ctas_collide_{uuid.uuid4().hex[:8]}"
    loc = str(tmp_path / "ctas_loc")
    assert client.ctas(name, "SELECT 1 AS a", location=loc) == 1
    with pytest.raises(QueryError):
        client.ctas(name, "SELECT 2 AS a", location=loc)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # SQL-text CTAS into a non-empty directory: Spark refuses with an
    # AnalysisException the client wraps — statement context intact
    with pytest.raises(QueryError) as ei:
        client.execute(
            f"CREATE TABLE ctas_ne_{uuid.uuid4().hex[:8]} USING parquet "
            f"LOCATION '{loc}' AS SELECT 3 AS a"
        )
    assert ei.value.sql is not None
