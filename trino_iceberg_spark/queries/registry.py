"""Query registry — the declared inventory behind ``__spark_entry__``.

Every implemented operator/query registers here with a Spark callable
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a DuckDB oracle
string over the pre-registered views ``region nation customer supplier part
orders lineitem events documents embeddings``. Column names are aliased
identically on both sides — the driver sorts columns by name before
hashing.
"""

from __future__ import annotations

import textwrap
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

__all__ = ["QUERIES", "ORACLES", "register", "load_all"]

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        return fn

    return deco


_LOADED = False


def load_all() -> None:
    """Import every query module so registration side effects run."""
    global _LOADED
    if _LOADED:
        return
    from . import surface  # noqa: F401
    from . import joins  # noqa: F401
    from . import windows  # noqa: F401
    from . import aggregates  # noqa: F401
    from . import tpch  # noqa: F401
    from . import tpch2  # noqa: F401
    from . import tpch3  # noqa: F401
    from . import pipeline  # noqa: F401
    from . import timetravel  # noqa: F401
    from . import streaming_q  # noqa: F401
    from . import events_q  # noqa: F401
    from . import temporal  # noqa: F401
    _LOADED = True
