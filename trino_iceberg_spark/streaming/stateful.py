"""Custom stateful streaming operator via applyInPandasWithState.

Running per-key aggregates with explicit state — the escape hatch when
windowed built-ins can't express the semantics (e.g. lifetime counters,
custom eviction). State is per-key and partition-local: scales with
distinct keys across the cluster, not with event volume.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_user_totals"]

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("lifetime_events", T.LongType(), False),
        T.StructField("lifetime_value", T.DoubleType(), False),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("v", T.DoubleType(), False),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Lifetime per-user event count + value sum, updated per micro-batch.

    Emits one row per user per batch with the running totals (update mode).
    """

    def update(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "lifetime_events": [n], "lifetime_value": [v]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
