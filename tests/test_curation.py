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


def test_boilerplate_removal_scopes_and_drops(spark):
    """Template passages repeat within a source → removed everywhere (no
    canonical keeper); the same passage across DIFFERENT sources is kept;
    all-boilerplate docs drop out."""
    from trino_iceberg_spark.operators.curation import boilerplate_removal

    docs = spark.createDataFrame(
        [
            # siteA: "nav bar home" heads every page -> boilerplate
            (1, "siteA", "nav bar home alpha beta gamma"),
            (2, "siteA", "nav bar home delta epsilon zeta"),
            (3, "siteA", "nav bar home"),  # entirely template -> drops out
            # siteB: same phrase, but only once there -> kept
            (4, "siteB", "nav bar home unique tail words"),
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_removal(
            docs, "text", "doc_id", "source", chunk_tokens=3, min_docs=2
        ).collect()
    }
    assert set(out) == {1, 2, 4}  # doc 3 was all boilerplate
    assert out[1]["clean_text"] == "alpha beta gamma"
    assert out[2]["clean_text"] == "delta epsilon zeta"
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 1
    # cross-source repetition is NOT boilerplate
    assert out[4]["clean_text"] == "nav bar home unique tail words"
    assert out[4]["n_kept"] == 2


def test_boilerplate_removal_null_group_keeps_everything(spark):
    """A NULL group has no site identity, so no boilerplate can be
    attributed: NULL-group documents keep ALL passages — even passages
    repeated across other NULL-group docs (the anti-join never matches a
    NULL key, on purpose; the old inner-join form silently DROPPED
    NULL-group documents entirely)."""
    from trino_iceberg_spark.operators.curation import boilerplate_removal

    docs = spark.createDataFrame(
        [
            (1, None, "nav bar home alpha beta gamma"),
            (2, None, "nav bar home delta epsilon zeta"),
            (3, "siteA", "nav bar home alpha beta gamma"),
            (4, "siteA", "nav bar home delta epsilon zeta"),
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_removal(
            docs, "text", "doc_id", "source", chunk_tokens=3, min_docs=2
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    # NULL-group docs: fully intact, shared passage included
    assert out[1]["clean_text"] == "nav bar home alpha beta gamma"
    assert out[2]["n_kept"] == 2
    # siteA still gets its template removed
    assert out[3]["clean_text"] == "alpha beta gamma"
    assert out[4]["clean_text"] == "delta epsilon zeta"


def test_dsir_log_weights_favor_target_like_documents(spark):
    """DSIR contract: a raw document made of the target's n-grams gets a
    HIGHER log importance weight than one made of raw-only n-grams;
    sub-n-gram documents get zero grams and weight exactly 0.0; weights
    are deterministic across runs."""
    from trino_iceberg_spark.operators.curation import dsir_log_weights

    target = spark.createDataFrame(
        [(100 + i, "quantum physics lecture notes") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "quantum physics lecture notes"),          # pure target-like
            (2, "celebrity gossip tabloid story"),         # raw-only grams
            (3, "quantum physics tabloid story"),          # mixed
            (4, "word"),                                   # < 2 tokens
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in dsir_log_weights(raw, target, "text", "doc_id").collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["log_weight"] > got[3]["log_weight"] > got[2]["log_weight"]
    assert got[2]["log_weight"] < 0  # raw-only: target assigns low mass
    assert got[4]["n_grams"] == 0 and got[4]["log_weight"] == 0.0
    again = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(raw, target, "text", "doc_id").collect()
    }
    assert again == {k: v["log_weight"] for k, v in got.items()}


def test_select_token_budget_invariants(spark, sf_dir):
    """The selection never exceeds the budget, is exactly the fully-funded
    best-first prefix (any rejected doc either scores below every kept
    doc's priority or wouldn't fit), rejects float scores, and is stable
    under repartition."""
    import pytest
    from pyspark.sql import functions as F

    from trino_iceberg_spark.operators.curation import select_token_budget
    from trino_iceberg_spark.operators.text import word_tokens_col
    from trino_iceberg_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(word_tokens_col(F.col("text"))).cast("long").alias("n"),
        F.size(F.array_distinct(word_tokens_col(F.lower(F.col("text")))))
        .cast("int")
        .alias("score"),
    )
    budget = 5000
    kept = select_token_budget(d, "score", "n", "doc_id", budget, 4096).collect()
    assert kept and sum(r["n"] for r in kept) <= budget
    # replay the greedy funding on the driver and compare exactly
    import hashlib

    rows = d.collect()
    order = sorted(
        rows,
        key=lambda r: (
            f"{4096 - r['score']:015x}"
            + hashlib.md5(str(r["doc_id"]).encode()).hexdigest()
        ),
    )
    cum, want = 0, {}
    for r in order:
        if cum + r["n"] <= budget:
            want[r["doc_id"]] = cum
        cum += r["n"]
    assert {r["doc_id"]: r["cum_before"] for r in kept} == want
    # repartition stability
    again = select_token_budget(
        d.repartition(13), "score", "n", "doc_id", budget, 4096
    ).collect()
    assert {r["doc_id"] for r in again} == set(want)
    # float scores rejected by contract
    with pytest.raises(ValueError, match="integer-typed"):
        select_token_budget(
            d.withColumn("score", F.col("score").cast("double")),
            "score", "n", "doc_id", budget, 4096,
        )


def test_select_token_budget_rejects_out_of_contract_scores(spark):
    """Out-of-range or NULL scores fail LOUDLY at execution instead of
    silently inverting the funding order (a negative hex difference
    would sort after every in-range key)."""
    import pytest

    from trino_iceberg_spark.operators.curation import select_token_budget

    d = spark.createDataFrame([(1, 10, 5), (2, 999, 5)], "id long, s int, n long")
    with pytest.raises(Exception, match="out of contract"):
        select_token_budget(d, "s", "n", "id", budget=100, max_score=31).collect()
    d2 = spark.createDataFrame([(1, None, 5)], "id long, s int, n long")
    with pytest.raises(Exception, match="out of contract"):
        select_token_budget(d2, "s", "n", "id", budget=100, max_score=31).collect()
