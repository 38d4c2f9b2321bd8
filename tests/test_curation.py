"""Curation pipeline invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from trino_iceberg_spark.operators.curation import (
    curate_documents,
    curation_decisions,
    curation_report,
)


def test_rejection_reasons(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again today", "en"),
        (2, "", "en"),                                   # empty
        (3, "short text", "en"),                         # too_short (2 tokens)
        (4, "ein gutes langes deutsches beispiel mit vielen woertern darin enthalten ja", "ja"),  # lang
        (5, "!!! ... ??? ,,, ;;; ::: !!! ... ??? ,,, um ok", "en"),  # punct
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    decided = curation_decisions(df, min_tokens=5)
    got = {r["doc_id"]: r["reject_reason"] for r in decided.collect()}
    assert got[1] is None
    assert got[2] == "empty"
    assert got[3] == "too_short"
    assert got[4] == "lang"
    assert got[5] == "punct"


def test_dedup_keeps_lowest_id(spark):
    text = "one two three four five six seven eight nine ten eleven"
    df = spark.createDataFrame(
        [(7, text, "en"), (3, text, "en"), (9, text + " twelve", "en")],
        ["doc_id", "text", "lang"],
    )
    kept = curate_documents(df)
    assert sorted(r["doc_id"] for r in kept.collect()) == [3, 9]


def test_report_partitions_all_docs(spark, sf_dir):
    from trino_iceberg_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents")
    report = curation_report(d)
    assert report.agg(F.sum("docs")).first()[0] == d.count()


def test_contamination_report_zero_grams_for_short_docs(spark):
    """A document with fewer than k tokens has ZERO k-grams (not the dedup
    path's synthetic whole-text gram) — the SQL-oracle contract."""
    from trino_iceberg_spark.operators.curation import contamination_report

    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "one two three four five six seven eight nine")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([("tiny doc",)], "text string")
    rows = {r["doc_id"]: r for r in contamination_report(docs, bench, k=8).collect()}
    assert rows[1]["n_grams"] == 0
    assert rows[1]["n_contaminated"] == 0
    assert rows[1]["contamination"] == 0.0
    assert rows[2]["n_grams"] == 2  # 9 tokens -> 9-8+1 distinct 8-grams
