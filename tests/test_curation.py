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
