"""Cross-engine determinism helpers.

The driver's correctness gate hash-compares Spark results against a DuckDB
oracle (BASELINE.md). Floating-point aggregation is order-dependent
(partition-parallel sums), so any ``SUM(double)`` can differ in the last
bit between engines — and between two Spark runs. The fix is exactness,
not tolerance: route double aggregations through DECIMAL, whose sums are
exact and therefore order-independent, then cast the final value back to
DOUBLE (a deterministic nearest-even conversion in both engines).

These helpers build the *same* arithmetic on both sides:
- :func:`dsum_col` / ``DSUM_SQL`` — exact sum of a double column.
- :func:`davg_col` / ``DAVG_SQL`` — exact-sum / count in double space.
- products (e.g. extendedprice * (1-discount)) are cast per-operand
  before multiplying so both engines compute the identical decimal value.

Integer sums/counts/min/max are already exact; they only need an explicit
result-type cast because DuckDB widens BIGINT sums to HUGEINT.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "DEC",
    "dec",
    "dsum_col",
    "davg_col",
    "isum_col",
    "dsum_sql",
    "davg_sql",
    "isum_sql",
    "dmul_col",
    "dmul_sql",
]

# 18 digits / 4 decimal places comfortably covers testdata magnitudes
# (prices ~1e5) while keeping product precision within DECIMAL(38,_).
DEC = "DECIMAL(18,4)"
_DEC_SUM = "DECIMAL(38,4)"


def dec(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def dsum_col(c: Column | str) -> Column:
    """Exact (order-independent) sum of a double column, as DOUBLE."""
    return F.sum(dec(c)).cast("double")


def davg_col(c: Column | str) -> Column:
    """Exact-sum average of a double column, as DOUBLE."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(dec(col)).cast("double") / F.count(col)


def isum_col(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col).cast("long")


def dmul_col(a: Column | str, b: Column | str) -> Column:
    """Decimal product of two double expressions (cast per operand)."""
    return dec(a) * dec(b)


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {DEC})) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {DEC})) AS DOUBLE) / COUNT({expr})"


def isum_sql(expr: str) -> str:
    return f"CAST(SUM({expr}) AS BIGINT)"


def dmul_sql(a: str, b: str) -> str:
    return f"(CAST({a} AS {DEC}) * CAST({b} AS {DEC}))"
