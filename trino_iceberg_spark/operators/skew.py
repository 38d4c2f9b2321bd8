"""Skew-mitigation helpers: salted aggregation and salted joins.

AQE's skew-join handles most runtime skew; salting is for the cases AQE
can't split — skewed *aggregation* keys, and hot keys in a join where the
other side must be replicated. Both are pure DataFrame rewrites.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_aggregate", "salted_join"]


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, Column],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups by (key, random-salt) — the hot key's rows spread over
    ``num_salts`` reducers; phase 2 merges the partials. Only works for
    decomposable aggregates (sum/count/min/max), which is what the caller
    passes: ``aggs`` maps output name → phase-1 aggregate expression, and
    the phase-2 merge re-aggregates with sum for sums/counts, min/max for
    min/max — communicated via the expression's name prefix:
    ``sum_*``/``cnt_*`` merge with sum, ``min_*`` with min, ``max_*`` with max.
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * num_salts).cast("int"))
    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    merged = []
    for name in aggs:
        if name.startswith("min_"):
            merged.append(F.min(name).alias(name))
        elif name.startswith("max_"):
            merged.append(F.max(name).alias(name))
        else:  # sums and counts merge additively
            merged.append(F.sum(name).alias(name))
    return phase1.groupBy(*key_cols).agg(*merged)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Hot-key equi-join: salt the (big, skewed) left side with a random
    salt; replicate each right row ``num_salts`` times, one per salt value.
    The join key becomes (key, salt) so a hot key's rows land on
    ``num_salts`` different reducers.

    Cost: right side × num_salts — use only when right is much smaller
    than the skewed key's row count (else let AQE skew-join handle it)."""
    salted_left = left.withColumn("_salt", (F.rand(seed=42) * num_salts).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))).alias("_salt")
    replicated_right = right.select("*", salts)
    out = salted_left.join(replicated_right, [on, "_salt"], how)
    return out.drop("_salt")
