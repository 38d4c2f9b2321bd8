-- Table DDL (reference: Scripts/create/02-tables.sql:7-53, Trino Iceberg →
-- Spark parquet-backed managed tables; same columns/types).
CREATE TABLE IF NOT EXISTS common_test_data.shared_data (
    id INT,
    value STRING,
    name STRING,
    age INT,
    active BOOLEAN,
    username STRING,
    email STRING,
    phone STRING,
    content STRING,
    value_int BIGINT,
    value_double DOUBLE,
    value_decimal DECIMAL(10,2)
) USING parquet;

CREATE TABLE IF NOT EXISTS common_test_data.category_data (
    amount BIGINT,
    category STRING
) USING parquet;

CREATE TABLE IF NOT EXISTS common_test_data.employee_data (
    employee_id INT,
    first_name STRING,
    last_name STRING,
    hire_date DATE
) USING parquet;

CREATE TABLE IF NOT EXISTS common_test_data.events_time_travel (
    event_id BIGINT,
    event_type STRING,
    event_time TIMESTAMP
) USING parquet;

CREATE TABLE IF NOT EXISTS common_test_data.scalar_test (
    id INT,
    int_value INT,
    string_value STRING,
    bool_value BOOLEAN,
    guid_value STRING,
    datetime_value TIMESTAMP,
    decimal_value DECIMAL(10,2),
    category STRING
) USING parquet;
