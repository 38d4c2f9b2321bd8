#!/usr/bin/env python
"""Commit-cost microbench: empirical evidence for the catalog's central
scale claim — commit cost depends on the METADATA the commit writes,
not on how much data the table already holds (SCALE.md: "writer
throughput scales with commit RATE, not volume, exactly like Iceberg").

Method: build two tables, one with a SHORT history/file list and one
with a LONG one (many prior single-file appends), then time M identical
1-row appends to each. The data written per commit is constant, so any
wall-clock growth with table size is commit-protocol overhead. With the
two-level manifest-list metadata (round 10) an append's metadata I/O is
one DELTA segment + one small snapshot JSON + one refs write — O(files
touched), never O(files in table); the only remaining table-size terms
are in-memory bookkeeping (the retained-file dict/prefix check), which
this bench measures directly. Also times M appends from 4 CONCURRENT
writers on one table to show contention degrades throughput by retries,
not by data volume.

The SYNTHETIC section stresses the metadata ceiling the single-JSON
format had (~100k files/table, SCALE.md): it fabricates snapshots whose
manifests reference 10k and 100k fake file entries through the ordinary
commit machinery (no data written — the entries are never read), then
times real 1-row appends on top. Flat sec/commit across 10 → 10k →
100k entries is the manifest-list claim, measured.

Usage:
    python tools/commit_bench.py          # defaults: 10 vs 200 files, M=15
    python tools/commit_bench.py 10 200 15 --synthetic   # + 10k/100k section
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


def _fabricate_files(t: SnapshotTable, n: int) -> None:
    """Grow the CURRENT snapshot's file list to ``n`` entries without
    writing data: one synthetic overwrite whose manifest references fake
    file paths, committed through the ordinary build/_commit_version
    machinery (so the resulting segments/manifest are exactly what a real
    n-file table carries). The fake entries are never read — subsequent
    appends only touch their own new file."""
    prev = t.current_snapshot()
    assert prev is not None

    def build(p):
        extra = [
            f"data/fake-{i:07d}.parquet" for i in range(n - len(p.files))
        ]
        files = list(p.files) + extra
        fs = dict(p.file_schemas or {})
        fs.update({f: p.schema_id for f in extra})
        return {
            "operation": "overwrite",
            "files": files,
            "row_count": p.row_count,
            "schema_id": p.schema_id,
            "last_column_id": p.last_column_id,
            "schemas": dict(p.schemas),
            "file_schemas": fs,
            "file_stats": dict(p.file_stats or {}),
            "properties": {"synthetic": "bench"},
        }

    t._commit_version("main", build)


def _synthetic_section(spark, base: str, m: int) -> dict:
    out = {}
    for n in (10, 10_000, 100_000):
        t = SnapshotTable(spark, os.path.join(base, f"syn_{n}"), commit_attempts=128)
        t.append(_one_row(spark, 0))
        _fabricate_files(t, n)
        _time_appends(spark, t, 2, 50_000)  # warm
        out[f"sec_per_commit_{n}_files"] = round(
            _time_appends(spark, t, m, 60_000), 3
        )
        assert len(t.current_snapshot().files) >= n
    out["synthetic_100k_over_10"] = round(
        out["sec_per_commit_100000_files"] / out["sec_per_commit_10_files"], 2
    )
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    synthetic = "--synthetic" in sys.argv[1:]
    small_n = int(args[0]) if len(args) > 0 else 10
    big_n = int(args[1]) if len(args) > 1 else 200
    m = int(args[2]) if len(args) > 2 else 15
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
        report = {
            "sec_per_commit_small_table": round(s, 3),
            "sec_per_commit_big_table": round(b, 3),
            "small_files": small_n,
            "big_files": big_n,
            "big_over_small": round(b / s, 2),
            "concurrent_commits_per_sec": round(n_commits / wall, 2),
            "concurrent_writers": 4,
        }
        if synthetic:
            report.update(_synthetic_section(spark, base, m))
        print(json.dumps(report))
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
