"""End-to-end training-data curation pipeline over a documents table.

Composes the individual operators (text quality → language allow-list →
exact dedup) into the single-pass shape a production corpus build runs:
one scan computes every per-document feature, one decision column records
the FIRST rejection reason (transparent filtering — counts by reason are
the pipeline's health metric), and dedup keys the single shuffle.

Scale design: all features are codegen'd column expressions over one
projection; the only wide operation is the dedup groupBy on the 16-byte
content hash. Nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import quality_features, token_count_col

__all__ = [
    "curation_decisions",
    "curate_documents",
    "curation_report",
    "decontaminate",
    "percentile_band_filter",
    "contamination_report",
    "boilerplate_removal",
    "dsir_log_weights",
    "domain_curation",
]


def curation_decisions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    allowed_langs: tuple[str, ...] = ("en", "de", "fr", "es"),
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    max_punct_ratio: float = 0.3,
    max_digit_ratio: float = 0.5,
) -> DataFrame:
    """Annotate every document with its curation decision.

    Adds ``n_tokens``, quality ratios, and ``reject_reason`` (null = keep).
    The first failing rule wins, in severity order — the decision trail
    stays auditable instead of a boolean black box."""
    feats = quality_features(F.col(text_col))
    annotated = df.withColumns(
        {
            "n_tokens": token_count_col(text_col),
            "punct_ratio": feats["punct_ratio"],
            "digit_ratio": feats["digit_ratio"],
        }
    )
    reason = (
        F.when(F.col(text_col).isNull() | (F.trim(F.col(text_col)) == ""), "empty")
        .when(~F.col(lang_col).isin(*allowed_langs), "lang")
        .when(F.col("n_tokens") < min_tokens, "too_short")
        .when(F.col("n_tokens") > max_tokens, "too_long")
        .when(F.col("punct_ratio") > max_punct_ratio, "punct")
        .when(F.col("digit_ratio") > max_digit_ratio, "digits")
        .otherwise(F.lit(None).cast("string"))
    )
    return annotated.withColumn("reject_reason", reason)


def curate_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    caches=None,
    **rules,
) -> DataFrame:
    """Kept documents after quality+language rules and exact dedup.

    Dedup keeps the lowest id per distinct text (deterministic keeper).
    The dedup verdict never shuffles documents: only (md5, id) pairs —
    24 bytes/doc — ever enter an exchange, every id that is not its
    group's minimum becomes the VICTIM set (duplicates only, small in a
    mostly-unique corpus), and the corpus anti-joins against it — the
    same corpus-never-shuffled shape as clustering's survivor selection.

    Round 17 (optimization guide §2.5 hot keys; VERDICT r16): the victim
    set is computed with NO window and NOTHING persisted. Round 16's
    min-over-window form (`Window.partitionBy(_h)`) shipped EVERY (md5,
    id) row of a duplicated-text group to one task — at 100 TB a viral
    duplicate (empty string, boilerplate page) makes one window task
    buffer the whole group, the exact shape :mod:`.dedup` refuses for
    its cluster sizing. Instead, dup-group minima come from a plain
    aggregate — ``groupBy(_h).agg(min, count)`` has map-side partial
    aggregation, so a hot text hash costs one counter per mapper — and
    the tiny minima table (duplicated texts only) joins back onto the
    pair stream (broadcast under AQE at any sane duplicate ratio; a
    shuffled join would still be skew-splittable, which a window is
    not). The pair stream feeds both the aggregate and the join-back, so
    it is shared via a lazy localCheckpoint — IDENTITY reuse, immune to
    the cache plan-matching misses round 16 measured (sp10's write plan
    held 8 independent pair-table rebuilds, 21 corpus scans, through a
    persist() that matched at planning time and missed at runtime); the
    checkpointed rows are 24 bytes/doc, the cheapest materialization in
    the pipeline, and a naive un-checkpointed join-back was measured
    re-running the quality-feature pass (+0.5 s/call at sf0.1).
    ``caches=`` callers get an exact-release handle for the checkpoint
    blocks (:func:`..operators.cachectl.checkpoint_lazy`)."""
    from .cachectl import checkpoint_lazy

    decided = curation_decisions(df, text_col, id_col, **rules)
    kept = decided.filter(F.col("reject_reason").isNull())
    pairs = checkpoint_lazy(
        kept.select(
            F.md5(F.col(text_col).cast("binary")).alias("_h"),
            F.col(id_col).alias("_vid"),
        ),
        caches,
    )
    # One row per DUPLICATED text: its keeper id. Groups of one drop out
    # here, so the join-back touches only duplicate rows (ids are unique
    # by contract).
    minima = (
        pairs.groupBy("_h")
        .agg(F.min("_vid").alias("_keep"), F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= 2)
        .select("_h", "_keep")
    )
    victims = (
        pairs.join(minima, "_h")
        .filter(F.col("_vid") != F.col("_keep"))
        .select(F.col("_vid").alias(id_col))
    )
    return kept.join(victims, id_col, "left_anti")


def curation_report(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", **rules) -> DataFrame:
    """Pipeline health metric: document count and token volume per
    decision bucket ('kept' or the rejection reason)."""
    decided = curation_decisions(df, text_col, id_col, **rules)
    bucket = F.coalesce(F.col("reject_reason"), F.lit("kept"))
    return (
        decided.groupBy(bucket.alias("decision"))
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").cast("long").alias("tokens"),
        )
        .orderBy("decision")
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    k: int = 8,
) -> DataFrame:
    """Benchmark decontamination: drop every training document sharing at
    least one ``k``-gram with a held-out benchmark set — the standard
    pretraining-hygiene pass (exact n-gram collision, the method used for
    GPT-3/Llama-style training sets).

    Both sides explode their distinct lowercase word ``k``-grams hashed to
    8 bytes (``xxhash64`` — the join key is 8 bytes instead of a ~50-char
    string, and the benchmark side stays small enough to broadcast);
    contaminated ids fall out of one broadcast semi-join, and the corpus
    itself is filtered with an anti-join on id. The corpus is scanned
    once; nothing about it is collected.

    K-gram contract (``empty_when_short=True``, matching
    :func:`contamination_report` and the SQL-oracle convention): a
    document with fewer than ``k`` tokens has ZERO ``k``-grams on either
    side — it can neither be contaminated nor contaminate. The dedup
    path's synthetic whole-text gram would instead drop any sub-``k``
    training doc whose exact text appears in the benchmark; that
    exact-match hygiene belongs to a dedup pass, not the n-gram
    collision contract documented here.
    """
    from .dedup import shingle_hashes

    bench_col = bench_text_col or text_col
    bench_grams = benchmark.select(
        F.explode(shingle_hashes(bench_col, k, empty_when_short=True)).alias("_g")
    ).distinct()
    doc_grams = df.select(
        F.col(id_col),
        F.explode(shingle_hashes(text_col, k, empty_when_short=True)).alias("_g"),
    )
    contaminated = (
        doc_grams.join(F.broadcast(bench_grams), "_g", "left_semi")
        .select(id_col)
        .distinct()
    )
    return df.join(contaminated, id_col, "left_anti")


def percentile_band_filter(
    df: DataFrame,
    score_col,
    lo_q: float = 0.1,
    hi_q: float = 0.95,
) -> DataFrame:
    """Keep rows whose ``score_col`` lies inside the corpus-wide
    ``[lo_q, hi_q]`` percentile band (the standard outlier gate in data
    curation: drop the too-short/too-long tails rather than hand-picking
    absolute thresholds per corpus).

    Scale shape: the thresholds come from ONE exact-percentile aggregate
    (a single wide reduce to one row — Spark's ``percentile`` does a
    distributed partial aggregation, not a sort), broadcast back into a
    map-side filter. No window over a global order, no driver round-trip
    with the data; at 100 TB this is a scan + 1-row shuffle + scan.
    Integer-valued scores keep the linear-interpolation arithmetic exact
    and engine-portable (the DuckDB oracle's quantile_cont computes the
    identical rational)."""
    score = score_col if not isinstance(score_col, str) else F.col(score_col)
    d = df.withColumn("_score", score)
    th = d.agg(
        F.percentile("_score", F.lit(lo_q)).alias("_lo"),
        F.percentile("_score", F.lit(hi_q)).alias("_hi"),
    )
    return (
        d.crossJoin(F.broadcast(th))
        .filter(F.col("_score").between(F.col("_lo"), F.col("_hi")))
        .drop("_score", "_lo", "_hi")
    )


def contamination_report(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    k: int = 8,
) -> DataFrame:
    """Per-document contamination scoring — the report companion to
    :func:`decontaminate`: for every training document, the count and
    fraction of its distinct ``k``-grams that collide with the benchmark
    set. Where decontaminate drops on ≥1 hit, the report lets a pipeline
    rank partial overlaps (near-verbatim leaks vs one idiomatic phrase)
    and pick its own threshold.

    Same scale shape as decontaminate: 8-byte hashed grams, benchmark
    side broadcast, one corpus scan; the per-doc aggregate shuffles on
    ``id_col`` with map-side combine. Documents too short to form a
    ``k``-gram are reported with zero grams."""
    from .dedup import shingle_hashes

    bench_col = bench_text_col or text_col
    bench_grams = benchmark.select(
        F.explode(shingle_hashes(bench_col, k)).alias("_g")
    ).distinct()
    # empty_when_short: a sub-k-token document has ZERO k-grams (n_grams=0,
    # contamination=0.0) — matching the SQL-oracle definition — rather than
    # the dedup path's one synthetic whole-text gram.
    doc_grams = df.select(
        F.col(id_col),
        F.explode_outer(shingle_hashes(text_col, k, empty_when_short=True)).alias("_g"),
    )
    scored = doc_grams.join(
        F.broadcast(bench_grams.withColumn("_hit", F.lit(1))), "_g", "left"
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.col("_g")).alias("n_grams"),
            F.count(F.col("_hit")).alias("n_contaminated"),
        )
        .withColumn(
            "contamination",
            F.when(
                F.col("n_grams") > 0, F.col("n_contaminated") / F.col("n_grams")
            ).otherwise(F.lit(0.0)),
        )
    )


def boilerplate_removal(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    chunk_tokens: int = 3,
    min_docs: int = 2,
) -> DataFrame:
    """Per-group boilerplate passage removal — the RefinedWeb/CCNet line-
    level dedup step (Penedo et al. 2023 remove lines repeated across
    pages of a site; Wenzek et al. 2020 dedup paragraphs) adapted to
    fixed ``chunk_tokens``-token passages: a passage that occurs in at
    least ``min_docs`` DISTINCT documents of the same ``group_col``
    (site/domain/source) is template boilerplate — nav bars, headers,
    cookie banners — and is removed from EVERY document of that group.
    Unique passages are reassembled in order.

    Differs from :func:`~trino_iceberg_spark.operators.dedup.passage_dedup`
    on both axes that matter for curation: the repetition scope is
    within-group (a phrase shared across unrelated sites is fine; the
    same phrase on every page of one site is template), and boilerplate
    is removed from ALL documents — there is no canonical keeper,
    because a nav bar is noise in its first occurrence too.

    Returns ``(id_col, clean_text, n_chunks, n_kept)``; documents that
    were entirely boilerplate drop out.

    Documents whose ``group_col`` is NULL have no site identity, so no
    boilerplate can be attributed to them: all their passages are kept
    (the anti-join below never matches a NULL group key).

    Scale shape: chunking is per-row JVM array work; the distinct-doc
    count aggregates on (group, md5(passage)) — high-cardinality,
    skew-free — and the verdict is a LEFT ANTI join against only the
    passages that crossed the ``min_docs`` threshold: the anti side is
    the boilerplate set (per-site templates — orders of magnitude
    smaller than the distinct-passage table), not every passage count,
    so AQE can broadcast it and the big side re-shuffles only when the
    template set is genuinely large. Per-group counting adds no skew:
    the group column only PREFIXES an already-unique hash key."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "
        ),
    )
    exploded = df.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_grp"),
        n_chunks.alias("n_chunks"),
        F.posexplode(F.when(n_chunks > 0, chunks)).alias("chunk_idx", "chunk"),
    ).withColumn("_h", F.md5(F.col("chunk")))
    boilerplate = (
        exploded.groupBy("_grp", "_h")
        .agg(F.count_distinct(F.col("_id")).alias("_docs"))
        .filter(F.col("_docs") >= min_docs)
        .select("_grp", "_h")
    )
    kept = exploded.join(boilerplate, ["_grp", "_h"], "left_anti")
    return kept.groupBy(F.col("_id").alias(id_col)).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
        F.first("n_chunks").alias("n_chunks"),
        F.count(F.lit(1)).cast("int").alias("n_kept"),
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    n_gram: int = 2,
) -> DataFrame:
    """Hashed n-gram importance weights for data selection (DSIR — Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling"): estimate per-document log importance weights
    ``log p_target(doc) / p_raw(doc)`` under bag-of-hashed-n-grams
    unigram models of the TARGET (small, high-quality) and RAW corpora,
    so a raw web crawl can be resampled toward the target distribution
    before training. The paper's feature space is hashed unigrams+bigrams;
    this implementation uses hashed ``n_gram``-grams (default bigrams).

    Returns ``(id_col, n_grams, log_weight)`` for every raw document
    (documents with fewer than ``n_gram`` tokens get 0 grams and weight
    0.0 — no evidence either way).

    Engine-portable by the repo's conventions: gram→bucket is
    ``portable_hash64 % num_buckets`` (md5-derived, replayable anywhere),
    bucket log-ratios are ROUNDed to 6 decimals ONCE per bucket and
    summed as exact DECIMAL — the per-document sum is order-independent,
    so the DuckDB oracle reproduces every weight bit-for-bit; DOUBLE
    appears only at the output boundary.

    Scale shape: gram hashing and bucketing are per-row JVM work; the two
    bucket-count aggregates are bounded by ``num_buckets`` (map-side
    partial combine, never corpus-sized); the bucket-weight table is
    ``num_buckets`` rows and BROADCASTS into the raw gram stream, so the
    raw corpus is never shuffled by gram — the only corpus-keyed shuffle
    is the final per-document partial-aggregated sum. Laplace (+1)
    smoothing keeps unseen buckets finite on both sides. Total cost:
    the target corpus is tokenized once, the raw corpus twice (bucket
    counts + the per-document weighted sum) — the gram TOTALS derive
    from the bucket-count table itself, never a third scan.
    """
    from .dedup import portable_hash64

    def grams(df: DataFrame) -> DataFrame:
        toks = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        g = F.when(
            F.size(toks) >= n_gram,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n_gram),
                lambda i: F.array_join(F.slice(toks, i + 1, n_gram), " "),
            ),
        )
        return df.select(
            F.col(id_col), F.explode(g).alias("_g")
        ).withColumn("_b", F.pmod(portable_hash64(F.col("_g")), F.lit(num_buckets)))

    from pyspark import StorageLevel

    raw_grams = grams(raw)
    target_grams = grams(target)
    tc = target_grams.groupBy("_b").agg(F.count(F.lit(1)).alias("_ct"))
    rc = raw_grams.groupBy("_b").agg(F.count(F.lit(1)).alias("_cr"))
    spark = raw.sparkSession
    domain = spark.range(num_buckets).select(F.col("id").alias("_b"))
    # The gram totals ARE the column sums of the bucket-count table —
    # derive them from the <= num_buckets-row counts (persisted: bounded
    # memory) instead of re-scanning either corpus for a COUNT(*); each
    # corpus is tokenized exactly once for its bucket counts, and the
    # raw stream a second time for the per-document weighted sum.
    counts = (
        domain.join(tc, "_b", "left")
        .join(rc, "_b", "left")
        .select(
            "_b",
            F.coalesce("_ct", F.lit(0)).alias("_ct"),
            F.coalesce("_cr", F.lit(0)).alias("_cr"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    totals = counts.agg(
        F.sum("_ct").alias("_T"), F.sum("_cr").alias("_R")
    )  # 1 row over num_buckets inputs: broadcast scalars, no data shuffle
    ratio = F.log(
        (F.col("_ct") + 1.0) / (F.col("_T") + F.lit(float(num_buckets)))
    ) - F.log(
        (F.col("_cr") + 1.0) / (F.col("_R") + F.lit(float(num_buckets)))
    )
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "_b", F.round(ratio, 6).cast("decimal(16,6)").alias("_w")
    )
    # Materialize the <= num_buckets-row weight table on the driver (a
    # spec-sized collect, like the seeded-centroid reads) so the persisted
    # bucket-count cache can be RELEASED here instead of leaking into the
    # returned lineage — this is a reusable library operator; without the
    # unpersist every call in a long-lived session pins another cached
    # table. The rebuilt local DataFrame broadcasts exactly as before.
    weight_rows = weights.collect()
    weights_schema = weights.schema
    counts.unpersist(blocking=False)
    weights = spark.createDataFrame(weight_rows, schema=weights_schema)
    doc_w = (
        raw_grams.join(F.broadcast(weights), "_b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("_w").cast("double").alias("log_weight"),
        )
    )
    return (
        raw.select(id_col)
        .join(doc_w, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )


def select_token_budget(
    df: DataFrame,
    score_col: str,
    token_count_col: str,
    id_col: str,
    budget: int,
    max_score: int,
) -> DataFrame:
    """Keep the highest-scoring documents whose tokens fit a global
    budget — the FineWeb-Edu-style selection step ("train on the best N
    tokens"): order the corpus by quality score descending, fund
    documents in order, stop when the budget is exhausted. A document is
    kept iff it is FULLY funded (its whole token count fits in the
    remaining budget), so the selection never exceeds ``budget``.

    ``score_col`` must be a NON-NULL INTEGER in ``[0, max_score]`` — the
    ordering key is built from it with fixed-width hex formatting, which
    both Spark and DuckDB render identically (``%015x``), keeping the
    selection engine-replayable; float scores order differently across
    engines at the last bit and are rejected by contract, and an
    out-of-range or NULL score fails the job loudly at execution
    (silently it would invert the funding order: a negative difference
    formats as a 16-char two's-complement key sorting after every
    in-range key). Ties break on the md5 of the id (deterministic,
    uniform).

    Scale shape: the global "running total in score order" reuses
    sequence packing's two-phase cumsum
    (:func:`~..packing.exclusive_cumsum`) with the bucket prefix set to
    score + 2 md5 hex chars: the score part alone is constant-prefixed
    ('00…' for realistic max_score), so bucketing MUST reach into the
    tiebreak chars — 256 uniform buckets per distinct score value, and
    no single-partition window ever sees the corpus. The broadcast
    bucket-offset table is 256 × observed distinct scores — bounded
    because integer quality scores are coarse by design. One shuffle for
    the bucketed window, one broadcast join; the budget compare is a
    per-row filter.

    Returns the kept rows of ``df`` plus ``cum_before`` (tokens funded
    to strictly-higher-priority documents).
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0 (got {budget})")
    if max_score <= 0:
        raise ValueError(f"max_score must be positive (got {max_score})")
    from pyspark.sql import types as T

    from .packing import exclusive_cumsum

    score_type = df.schema[score_col].dataType
    if not isinstance(score_type, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        raise ValueError(
            f"score_col must be integer-typed for engine-replayable ordering "
            f"(got {score_type.simpleString()})"
        )
    s = F.col(score_col)
    checked = F.when(
        s.isNotNull() & (s >= 0) & (s <= max_score),
        (F.lit(max_score) - s).cast("long"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"select_token_budget: {score_col} out of contract "
                    f"[0, {max_score}] (got "
                ),
                F.coalesce(s.cast("string"), F.lit("NULL")),
                F.lit(")"),
            )
        ).cast("long")
    )
    key = F.concat(
        F.format_string("%015x", checked),
        F.md5(F.col(id_col).cast("string")),
    )
    keyed = df.withColumn("_budget_key", key)
    cum = exclusive_cumsum(
        keyed,
        "_budget_key",
        token_count_col,
        out_col="cum_before",
        bucket_prefix_len=17,
    )
    return (
        cum.filter(
            F.col("cum_before") + F.col(token_count_col).cast("long")
            <= F.lit(budget)
        )
        .drop("_budget_key")
    )


def domain_curation(
    docs: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    chars_col: str = "n_chars",
    deny: list[str] | None = None,
    min_docs: int = 1,
    min_avg_chars: int = 0,
    max_per_domain: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Domain/URL-level corpus gating — the per-DOMAIN curation layer the
    big public web-corpus pipelines (C4, RefinedWeb, FineWeb) run on top
    of per-document filters: a domain's aggregate statistics gate ALL its
    documents at once, deny-listed domains drop wholesale, and surviving
    mega-domains are capped so no single site dominates the mixture.

    Gates (a document survives iff its domain passes all three):

    - ``deny``: explicit domain deny-list (a literal IN filter — at
      production size this is a broadcast anti-join against the deny
      table; the literal form keeps small lists map-side with zero join);
    - ``min_docs``: domains with fewer documents are dropped (thin
      domains carry no signal and are disproportionately spam);
    - ``min_avg_chars``: average document length per domain, evaluated
      EXACTLY as ``sum(chars) >= count * min_avg_chars`` over integer
      aggregates — no float division, so the gate is bit-reproducible in
      any replaying engine;
    - ``max_per_domain``: keep at most N documents per surviving domain,
      chosen by portable md5-hash rank (:func:`..operators.splits.
      sample_fixed_per_group`) — deterministic, engine-replayable
      membership, and nested (a cap of 50 is a subset of a cap of 100).

    Returns the surviving documents' (id, domain, chars) columns plus the
    domain aggregates ``domain_docs``/``domain_chars`` (and ``kept_rank``
    when capped). Documents with a NULL domain are ALWAYS dropped — no
    provenance fails domain curation by contract (the gate join's SQL
    NULL-equality enforces it identically here and in any SQL replayer,
    independent of the deny list).

    Scale shape (100 TB story): the domain aggregate is ONE partial-agg
    groupBy whose output is #domains rows — a viral mega-domain costs
    nothing extra because map-side combine collapses it per task
    (operators/skew.py's salted aggregate exists for the pathological
    single-key case). The gate join broadcasts the (tiny) surviving-domain
    table, so the corpus scan is one pass with a map-side filter. The cap
    is a per-domain rank window whose ≤ N filter Spark pushes into the
    sort (WindowGroupLimit) — no domain ever materializes beyond its
    top-N in a task."""
    from .splits import sample_fixed_per_group

    stats = docs.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("domain_docs"),
        F.sum(chars_col).cast("long").alias("domain_chars"),
    )
    gate = (F.col("domain_docs") >= min_docs) & (
        F.col("domain_chars") >= F.col("domain_docs") * min_avg_chars
    )
    if deny:
        # NULL domains are never deny-listed: isin(NULL) is NULL, which
        # would silently drop the whole NULL-domain group only when a
        # deny list happens to be supplied — coalesce keeps NULL-domain
        # handling independent of this parameter (they still face the
        # min_docs/min_avg_chars gates like any group)
        gate = gate & ~F.coalesce(
            F.col(domain_col).isin(list(deny)), F.lit(False)
        )
    allowed = stats.filter(gate)
    out = docs.select(id_col, domain_col, chars_col).join(
        F.broadcast(allowed), domain_col
    )
    if max_per_domain is not None:
        out = sample_fixed_per_group(
            out, id_col, domain_col, max_per_domain, seed
        ).withColumnRenamed("_rank", "kept_rank")
    return out
