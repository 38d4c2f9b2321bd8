"""Lazy (zero-extra-job) diagnostics for skew-guard recall loss.

Round 16 introduced ``eager_diagnostics=False`` on the guarded dedup /
similarity operators: it keeps the guard's FILTER (identical output) but
used to drop the dropped-rows *report* entirely, so on exactly the bench
paths a guard silently excluding data at scale would never surface
(VERDICT r16 "What's wrong #4"). This module restores the report without
restoring the report's cost: a ``CollectMetrics`` observation
(`DataFrame.observe`) piggybacks the dropped-cell/viral-shingle counts
onto whatever action the CALLER eventually runs — no extra Spark job, no
eager materialization at plan-build time — and a tiny daemon poller logs
the warning once the first action completes.

The poller polls the JVM observation's non-blocking ``getRowOrEmpty``
with exponential backoff (0.2 s → 30 s cap), so a plan that is never
executed costs one sleeping daemon thread and no Spark work; threads die
with the process. Observation names are sequence-numbered because Spark
requires them unique per query.

Known limit: when AQE's empty-relation propagation prunes the entire
observed subtree (a query whose result is EMPTY because the guard
dropped everything), the CollectMetrics node is pruned with it and the
observation completes with an empty row — the reporter sees nothing. In
that pathological case the recall loss is self-evident from the empty
output; every partial-drop case reports normally.
"""

from __future__ import annotations

import itertools
import logging
import threading
import time
from typing import Callable

from pyspark.sql import Column, DataFrame, Observation

__all__ = ["lazy_metrics_report"]

_SEQ = itertools.count()

#: test hook — threads register here so tests can join them
_LIVE_POLLERS: list[threading.Thread] = []


def lazy_metrics_report(
    df: DataFrame,
    report: Callable[[dict], None],
    **metrics: Column,
) -> DataFrame:
    """Attach aggregate ``metrics`` to ``df`` as a query observation and
    invoke ``report(values)`` from a daemon thread after the first action
    over the returned DataFrame completes.

    The caller's ``report`` decides whether the values warrant a warning
    (e.g. only when a dropped-count is non-zero). Runs NO job of its own;
    if the plan is never executed, ``report`` is never called."""
    obs = Observation(f"tis_lazy_report_{next(_SEQ)}")
    names = list(metrics)
    out = df.observe(obs, *[col.alias(name) for name, col in metrics.items()])

    def poll() -> None:
        delay = 0.2
        while True:
            try:
                # Read the JVM row positionally: both getOrEmpty and the
                # Python Observation.get conversion fail on the
                # SCHEMA-LESS observation rows Spark 4.1 emits when the
                # CollectMetrics node runs inside a broadcast stage.
                opt = obs._jo.getRowOrEmpty()
                if not opt.isEmpty():
                    jrow = opt.get()
                    if jrow.length() >= len(names):
                        report({n: jrow.get(i) for i, n in enumerate(names)})
                    # an EMPTY metrics row means AQE pruned the observed
                    # subtree (empty result) — nothing to report
                    return
            except Exception:  # noqa: BLE001 — a stopped session ends the poller
                return
            time.sleep(delay)
            delay = min(delay * 1.6, 30.0)

    t = threading.Thread(
        target=poll, daemon=True, name=f"tis-lazy-report-{obs._name}"
    )
    _LIVE_POLLERS.append(t)
    t.start()
    return out


def skew_guard_report(op_name: str, message: str) -> Callable[[dict], None]:
    """Standard reporter: WARN through the operator module's logger when
    the first metric (a dropped-count) is non-zero. ``message`` is a
    %-format string receiving the metric values in declaration order."""

    def _report(values: dict) -> None:
        vals = list(values.values())
        if vals and vals[0]:
            logging.getLogger("trino_iceberg_spark.operators").warning(
                "%s: " + message, op_name, *vals
            )

    return _report
