#!/usr/bin/env python
"""Measure incremental vs full ANALYZE cost (round 13).

Builds a snapshot table of N rows (appended in CHUNKS so the manifest
holds many files), runs a whole-table ANALYZE to establish the sketch
baseline, appends a small delta (default 1%), then times:

- ``analyze(mode="full")``      — rescan everything (Trino's ANALYZE)
- ``analyze(mode="incremental")`` — scan ONLY the delta files and merge
  (HLL union + exact count addition + bound comparison)

The claim under measurement: incremental cost tracks the DELTA, not the
table — the speedup should grow ~linearly with table_rows/delta_rows.
This is the statistics analog of the changelog-from-deletes measurement
(tools/changelog_bench.py): both replace an O(table) maintenance scan
with an O(change) one.

Usage:
    python tools/analyze_bench.py                       # 2M and 8M tiers
    python tools/analyze_bench.py --rows 4000000        # one tier
    python tools/analyze_bench.py --delta-frac 0.002
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trino_iceberg_spark.catalog.snapshots import SnapshotTable  # noqa: E402
from trino_iceberg_spark.session import get_spark  # noqa: E402

CHUNKS = 16  # appended files before the delta


def _frame(spark, lo: int, hi: int):
    return spark.range(lo, hi).selectExpr(
        "id AS k",
        "CAST(id % 1000 AS STRING) AS g",
        "CASE WHEN id % 11 = 0 THEN NULL ELSE CAST(id AS DOUBLE) END AS v",
        "CAST(id % 100000 AS BIGINT) AS u",
    )


def run_tier(spark, rows: int, delta_frac: float, workdir: str) -> dict:
    tdir = os.path.join(workdir, f"an_{rows}")
    t = SnapshotTable(spark, tdir)
    step = rows // CHUNKS
    for i in range(CHUNKS):
        t.append(_frame(spark, i * step, (i + 1) * step).coalesce(2))
    t0 = time.time()
    t.analyze()  # baseline whole-table run (stores the sketches)
    t_base = time.time() - t0

    delta = max(1, int(rows * delta_frac))
    t.append(_frame(spark, rows, rows + delta).coalesce(1))

    t0 = time.time()
    t.analyze(mode="incremental")
    t_inc = time.time() - t0

    # re-baseline is now current; append the SAME-sized delta again so the
    # full run times an equivalent table state
    t.append(_frame(spark, rows + delta, rows + 2 * delta).coalesce(1))
    t0 = time.time()
    t.analyze(mode="full")
    t_full = time.time() - t0

    shutil.rmtree(tdir, ignore_errors=True)
    return {
        "rows": rows,
        "files": CHUNKS * 2 + 2,
        "delta_rows": delta,
        "analyze_full_sec": round(t_full, 2),
        "analyze_incremental_sec": round(t_inc, 2),
        "speedup": round(t_full / t_inc, 1) if t_inc > 0 else None,
        "baseline_first_analyze_sec": round(t_base, 2),
    }


def main() -> int:
    rows_args = [int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--rows=")]
    frac = next(
        (float(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--delta-frac=")),
        0.01,
    )
    tiers = rows_args or [2_000_000, 8_000_000]
    spark = get_spark(
        app_name="analyze_bench", master="local[16]", shuffle_partitions=16
    )
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="analyze_bench_")
    try:
        for rows in tiers:
            print(json.dumps(run_tier(spark, rows, frac, workdir)))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
