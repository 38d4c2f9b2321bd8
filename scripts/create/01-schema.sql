-- Schema bootstrap (reference: Scripts/create/01-schema.sql — CREATE SCHEMA
-- with an explicit warehouse location; Spark namespaces inherit the
-- session warehouse dir).
CREATE DATABASE IF NOT EXISTS common_test_data;
