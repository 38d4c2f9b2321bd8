"""Retrieval evaluation metrics — the offline-eval half of an embedding
pipeline: given ranked results and relevance judgments, compute
recall@k / MRR@k / nDCG@k per query, distributed.

A training-data platform doesn't just BUILD retrieval indexes (ss01–ss07);
it has to measure them after every data or model change. These are the
standard TREC-style metrics, expressed as one join + one aggregate so the
evaluation scales to millions of queries: nothing driver-side, no
per-query loops.

Determinism: hit accounting is integer; the only floats are the final
per-query divisions and the nDCG log2 weights, computed in a fixed
operation order per row (no multi-row float accumulation except the DCG
sum over ≤ k ordered ranks, which both engines evaluate in rank order in
the oracle's construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["retrieval_metrics"]


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query recall@k, MRR@k, and nDCG@k (binary relevance).

    ``results``: ranked candidates ``(query_col, doc_col, rank_col)`` with
    rank 1 = best; rows with rank > k are ignored. ``qrels``: the
    relevance judgments ``(query_col, doc_col)`` — every listed pair is
    relevant. Queries present in ``qrels`` but retrieving nothing still
    report (0, 0, 0); queries with no judgments are dropped (undefined
    metrics, as in trec_eval).

    - ``recall_at_k`` = hits / min(n_relevant, k) (capped recall, so a
      query with more relevant docs than k can still reach 1.0)
    - ``mrr_at_k``    = 1 / rank of the first relevant hit, else 0
    - ``ndcg_at_k``   = Σ_hits 1/log2(rank+1) normalized by the ideal
      prefix Σ_{i=1..min(n_rel,k)} 1/log2(i+1)

    Scale shape: one equi-join of the rank-filtered results against the
    judgments on (query, doc), then a groupBy(query) aggregate with
    map-side combine; the per-query judgment counts ride a second small
    aggregate joined back on query id. Millions of queries = an ordinary
    shuffle, no windows over the corpus."""
    res = results.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rank_col).alias("_r"),
    )
    rel = qrels.select(
        F.col(query_col).alias("_q"), F.col(doc_col).alias("_d")
    ).distinct()
    n_rel = rel.groupBy("_q").agg(F.count(F.lit(1)).alias("_n_rel"))
    hits = res.join(rel, ["_q", "_d"])  # relevant retrieved, with rank
    per_q = hits.groupBy("_q").agg(
        F.count(F.lit(1)).alias("_hits"),
        F.min("_r").alias("_first"),
        F.sum(1.0 / F.log2(F.col("_r") + F.lit(1.0))).alias("_dcg"),
    )
    # ideal DCG over the first min(n_rel, k) slots — a fixed scalar per
    # n_rel value, computed as an expression (no extra shuffle)
    ideal_n = F.least(F.col("_n_rel"), F.lit(k))
    idcg = F.aggregate(
        F.sequence(F.lit(1), ideal_n),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + F.lit(1.0)),
    )
    return (
        n_rel.join(per_q, "_q", "left")
        .select(
            F.col("_q").alias(query_col),
            F.col("_n_rel").alias("n_relevant"),
            F.coalesce(F.col("_hits"), F.lit(0)).alias("hits"),
            (
                F.coalesce(F.col("_hits"), F.lit(0)) / ideal_n.cast("double")
            ).alias("recall_at_k"),
            F.coalesce(1.0 / F.col("_first"), F.lit(0.0)).alias("mrr_at_k"),
            F.coalesce(F.col("_dcg") / idcg, F.lit(0.0)).alias("ndcg_at_k"),
        )
    )
