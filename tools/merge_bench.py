#!/usr/bin/env python
"""SQL MERGE write-mode microbench: empirical evidence for the round-14
claims — a small CDC upsert through ``MERGE INTO`` in SQL text costs the
upsert's own data in BOTH write modes, not a table rewrite.

Method: key-clustered snapshot tables at doubling row counts (constant
rows/file, disjoint per-file key ranges). Per tier and per mode
(``write.merge.mode`` = copy-on-write | merge-on-read), run ONE identical
SQL MERGE touching a fixed 1k-key band (conditional UPDATE + DELETE
routes) plus 100 inserts, and record wall time, how many parent data
files survived by identity, and how many new files the commit wrote.
The claim holds if both modes stay ~flat across tiers: merge-on-read
commits position deletes + changed images (zero files rewritten),
copy-on-write rewrites exactly the files overlapping the key band.

Usage:
    python tools/merge_bench.py             # tiers 2M / 4M / 8M rows
    python tools/merge_bench.py --tiers 2
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trino_iceberg_spark.catalog.snapshots import SnapshotTable  # noqa: E402
from trino_iceberg_spark.client import AthenaSparkClient  # noqa: E402
from trino_iceberg_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", type=int, default=3)
    ap.add_argument("--base-rows", type=int, default=2_000_000)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark(
        app_name="merge_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        warehouse_dir=tempfile.mkdtemp(prefix="mgb_wh_"),
    )
    client = AthenaSparkClient(spark)
    root = tempfile.mkdtemp(prefix="mgb_")
    out = {"tiers": []}
    try:
        for tier in range(args.tiers):
            rows = args.base_rows * (2**tier)
            files = 16 * (2**tier)
            rec = {"rows": rows, "files": files}
            for mode in ("copy-on-write", "merge-on-read"):
                path = os.path.join(root, f"t{tier}_{mode}")
                t = SnapshotTable(spark, path)
                t.append(
                    spark.range(rows).selectExpr(
                        "id AS k", "CAST(id % 7 AS DOUBLE) AS v"
                    ),
                    cluster_by=["k"],
                    cluster_partitions=files,
                )
                t.set_table_property("write.merge.mode", mode)
                name = f"mgb_{tier}_{mode.replace('-', '_')}"
                client.register_snapshot_table(name, path)
                lo = rows // 2
                spark.range(lo, lo + 1_000).selectExpr(
                    "id AS k", "CAST(-1 AS DOUBLE) AS sv"
                ).union(
                    spark.range(rows + 1, rows + 101).selectExpr(
                        "id AS k", "CAST(0 AS DOUBLE) AS sv"
                    )
                ).createOrReplaceTempView("mgb_src")
                snap0 = t.current_snapshot()
                t0 = time.monotonic()
                n = client.execute(
                    f"MERGE INTO {name} t USING (SELECT * FROM mgb_src) s "
                    "ON t.k = s.k "
                    "WHEN MATCHED AND t.k % 10 = 0 THEN DELETE "
                    "WHEN MATCHED THEN UPDATE SET v = s.sv "
                    "WHEN NOT MATCHED THEN INSERT VALUES (s.k, s.sv)"
                )
                sec = time.monotonic() - t0
                snap1 = t.current_snapshot()
                kept = len(set(snap0.files) & set(snap1.files))
                key = "cow" if mode == "copy-on-write" else "mor"
                rec[f"{key}_sec"] = round(sec, 3)
                rec[f"{key}_files_kept"] = kept
                rec[f"{key}_files_rewritten"] = len(snap0.files) - kept
                rec[f"{key}_new_files"] = len(set(snap1.files) - set(snap0.files))
                rec[f"{key}_affected"] = n
                shutil.rmtree(path, ignore_errors=True)
            out["tiers"].append(rec)
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
