#!/usr/bin/env python
"""Commit-cost microbench: empirical evidence for the catalog's central
scale claim — commit cost depends on the METADATA the commit writes,
not on how much data the table already holds (SCALE.md: "writer
throughput scales with commit RATE, not volume, exactly like Iceberg").

Method: build two tables, one with a SHORT history/file list and one
with a LONG one (many prior single-file appends), then time M identical
1-row appends to each. The data written per commit is constant, so any
wall-clock growth with table size is commit-protocol overhead (manifest
assembly is O(files) JSON, the lock section one manifest write + one
refs write — both metadata; nothing scans data). Also times M appends
from 4 CONCURRENT writers on one table to show contention degrades
throughput by retries, not by data volume.

Usage:
    python tools/commit_bench.py          # defaults: 10 vs 200 files, M=15
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trino_iceberg_spark.catalog.snapshots import SnapshotTable  # noqa: E402
from trino_iceberg_spark.session import get_spark  # noqa: E402


def _one_row(spark, v: int):
    return spark.createDataFrame([(v, "t")], "v INT, tag STRING").coalesce(1)


def _build(spark, path: str, n_commits: int) -> SnapshotTable:
    t = SnapshotTable(spark, path, commit_attempts=128)
    for i in range(n_commits):
        t.append(_one_row(spark, i))
    return t


def _time_appends(spark, t: SnapshotTable, m: int, base: int) -> float:
    t0 = time.time()
    for i in range(m):
        t.append(_one_row(spark, base + i))
    return (time.time() - t0) / m


def main() -> int:
    small_n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    big_n = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    spark = get_spark(app_name="commit_bench", shuffle_partitions=4)
    base = tempfile.mkdtemp(prefix="commit_bench_")
    try:
        small = _build(spark, os.path.join(base, "small"), small_n)
        big = _build(spark, os.path.join(base, "big"), big_n)
        # warm both paths once, then measure
        _time_appends(spark, small, 2, 10_000)
        _time_appends(spark, big, 2, 10_000)
        s = _time_appends(spark, small, m, 20_000)
        b = _time_appends(spark, big, m, 20_000)

        # contention: 4 writers x m/2 appends on one fresh table
        cont = SnapshotTable(spark, os.path.join(base, "cont"), commit_attempts=128)
        cont.append(_one_row(spark, 0))
        errs: list[BaseException] = []

        def writer(w: int) -> None:
            try:
                t = SnapshotTable(
                    spark, os.path.join(base, "cont"), commit_attempts=128
                )
                for i in range(max(2, m // 2)):
                    t.append(_one_row(spark, 30_000 + w * 1000 + i))
            except BaseException as exc:  # noqa: BLE001
                errs.append(exc)

        threads = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
        t0 = time.time()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.time() - t0
        n_commits = 4 * max(2, m // 2)
        assert not errs, errs
        assert len(cont.main_ancestry()) == n_commits + 1
        print(
            json.dumps(
                {
                    "sec_per_commit_small_table": round(s, 3),
                    "sec_per_commit_big_table": round(b, 3),
                    "small_files": small_n,
                    "big_files": big_n,
                    "big_over_small": round(b / s, 2),
                    "concurrent_commits_per_sec": round(n_commits / wall, 2),
                    "concurrent_writers": 4,
                }
            )
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
