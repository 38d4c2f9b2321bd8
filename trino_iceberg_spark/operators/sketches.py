"""Approximate/sketch aggregates — the 100 TB substitutes for exact
distinct/quantiles (SURVEY.md §2.C scalar-fn surface; Spark built-ins)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["approx_distinct", "approx_quantiles", "frequent_items"]


def approx_distinct(df: DataFrame, col: str, group_by: list[str] | None = None, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct count (approx_count_distinct) — mergeable,
    constant memory; the correct choice when COUNT(DISTINCT) would shuffle
    trillions of keys."""
    agg = F.approx_count_distinct(col, rsd).alias(f"approx_distinct_{col}")
    return df.groupBy(*(group_by or [])).agg(agg)


def approx_quantiles(
    df: DataFrame, col: str, probabilities: list[float], accuracy: int = 10000,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Greenwald-Khanna approximate percentiles (percentile_approx)."""
    agg = F.percentile_approx(
        col, [F.lit(p) for p in probabilities], F.lit(accuracy)
    ).alias(f"quantiles_{col}")
    return df.groupBy(*(group_by or [])).agg(agg)


def frequent_items(df: DataFrame, col: str, support: float = 0.01) -> DataFrame:
    """Heavy hitters via Karp et al. frequent-items sketch (freqItems)."""
    return df.freqItems([col], support)
