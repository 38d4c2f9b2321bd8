#!/usr/bin/env python
"""Changelog-across-MOR-boundary cost: delete-file-derived delta vs the
round-10 full logical diff (round-11 directive #3's before/after).

Builds a lineitem-replica table (``--replicas 10`` ≈ 6M rows at sf0.1),
commits one small equality delete (two keys) and one contained position
delete, then times:

- ``changelog(s1, s2)`` — the NEW path: dead rows derived from the
  delete files, reading only the files they can touch (position deletes
  name exact files; equality deletes zone-map-prune within the horizon);
- the OLD path's exact semantics, reconstructed inline: both snapshots
  read in full (deletes applied) and diffed with two ``exceptAll``s —
  what ``changelog`` did across any MOR boundary before round 11.

Both sides produce the same logical answer (asserted); the ratio is the
measured O(affected-files) vs O(table) gap, which only grows with table
size. Prints one JSON line.

Usage:
    python tools/changelog_bench.py                # sf0.1, 1 replica
    python tools/changelog_bench.py --replicas 10  # the 6M-row run
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trino_iceberg_spark.catalog.snapshots import SnapshotTable  # noqa: E402
from trino_iceberg_spark.session import get_spark  # noqa: E402


def main() -> int:
    replicas = 1
    for a in sys.argv[1:]:
        if a.startswith("--replicas"):
            replicas = int(a.split("=", 1)[1]) if "=" in a else int(
                sys.argv[sys.argv.index(a) + 1]
            )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="changelog_bench")
    base = tempfile.mkdtemp(prefix="changelog_bench_")
    one = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    li = one
    for r in range(1, replicas):
        li = li.unionByName(
            one.withColumn("l_orderkey", F.col("l_orderkey") + r * 100_000_000)
        )
    report: dict = {"sf_dir": sf_dir, "replicas": replicas, "rows": li.count()}
    try:
        t = SnapshotTable(spark, os.path.join(base, "t"))
        t.append(li, cluster_by=["l_orderkey"], cluster_partitions=16 * replicas)
        s1 = t.current_snapshot()
        # one contained position delete + one tight-envelope equality
        # delete — the CDC shape: kilobytes of delete files per commit
        t.delete_where(F.col("l_orderkey") <= 64, mode="merge-on-read")
        t.delete_by_key(
            spark.createDataFrame([(101,), (102,)], "l_orderkey long"),
            ["l_orderkey"],
        )
        s2 = t.current_snapshot()
        report["files"] = len(s2.files)

        t0 = time.time()
        fast = t.changelog(s1.snapshot_id, s2.snapshot_id)
        n_fast = fast.count()
        report["changelog_fast_sec"] = round(time.time() - t0, 2)
        report["change_rows"] = n_fast

        # the pre-round-11 cost, reconstructed: full logical diff
        t0 = time.time()
        a = t.read_version(s1.snapshot_id)
        b = t.read_version(s2.snapshot_id)
        n_slow = b.exceptAll(a).count() + a.exceptAll(b).count()
        report["changelog_fulldiff_sec"] = round(time.time() - t0, 2)
        assert n_slow == n_fast, (n_slow, n_fast)
        report["speedup"] = round(
            report["changelog_fulldiff_sec"]
            / max(report["changelog_fast_sec"], 1e-9),
            2,
        )
        print(json.dumps(report))
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
