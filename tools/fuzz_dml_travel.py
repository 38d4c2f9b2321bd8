#!/usr/bin/env python
"""Integration fuzzing of SQL DML × time travel: every intermediate
state a generated DML sequence passes through must be reconstructable
afterwards by BOTH travel addressings.

tools/fuzz_dml.py proves each DML statement's semantics against a
DuckDB twin; tools/fuzz_timetravel.py proves the travel REWRITER against
direct-API twins over histories built with the direct API. This tool
closes the remaining composition: histories built through the SQL-text
DML path (``client.execute`` → snapshot commits) replayed through the
SQL-text travel path (``FOR VERSION/TIMESTAMP AS OF`` → snapshot reads).

Per case: seed a snapshot table (fuzz_dml's generator), apply 3–7
generated INSERT/UPDATE/DELETE/MERGE statements through the client, and
after EVERY statement record (latest snapshot id, its commit timestamp,
the sorted current table state). Then for each checkpoint assert:

- ``FOR VERSION AS OF <id>`` returns exactly the recorded state;
- ``FOR TIMESTAMP AS OF '<committed_at>'`` (as-of is inclusive) returns
  the same;
- a timestamp 1µs BEFORE the first commit refuses on the client path.

No-op statements and refused multi-match merges leave the snapshot id
unchanged — the duplicate checkpoint then simply re-asserts the same
reconstruction, which is itself part of the contract.

Usage:
    python tools/fuzz_dml_travel.py          # 30 sequences, seed 0
    python tools/fuzz_dml_travel.py 50 7     # 50 sequences, seed 7
    python tools/fuzz_dml_travel.py 30 0 --mor   # DELETE/UPDATE via
                                                 # merge-on-read v2 deletes

``--mor`` sets write.delete.mode/write.update.mode=merge-on-read on
every fuzzed table, so the HISTORIES contain position-delete snapshots
— each checkpoint reconstruction then exercises time travel over the
anti-join read path (old snapshots with fewer/no delete files, new ones
with accrued files), the composition the dedicated fuzzers don't reach.

Exit 1 on any divergence; failures print the statement sequence.
"""

from __future__ import annotations

import datetime as dt
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.fuzz_dml import SCHEMA, gen_statement, seed_rows  # noqa: E402
from trino_iceberg_spark.catalog.snapshots import SnapshotTable  # noqa: E402
from trino_iceberg_spark.client import AthenaSparkClient  # noqa: E402
from trino_iceberg_spark.errors import EngineError, QueryError  # noqa: E402
from trino_iceberg_spark.session import get_spark  # noqa: E402


def _ts_literal(ts: dt.datetime) -> str:
    return ts.astimezone(dt.timezone.utc).strftime("%Y-%m-%d %H:%M:%S.%f")


def _key(row: tuple) -> tuple:
    # None-safe total order: NULLs sort last within a column position
    return tuple((v is None, "" if v is None else v) for v in row)


def _state(client: AthenaSparkClient, rel: str) -> list[tuple]:
    return sorted((tuple(r) for r in client.query(f"SELECT * FROM {rel}")), key=_key)


def run_sequence(
    spark, seq_no: int, seed: int, workdir: str, delete_mode: str = "copy-on-write"
) -> list[str]:
    """Returns a list of divergence descriptions (empty = agree)."""
    rng = random.Random(seed * 9_000_011 + seq_no)
    tdir = os.path.join(workdir, f"fzt_{seq_no}")
    table = SnapshotTable(spark, tdir)
    if delete_mode != "copy-on-write":
        table.set_table_property("write.delete.mode", delete_mode)
        table.set_table_property("write.update.mode", delete_mode)
    table.append(spark.createDataFrame(seed_rows(rng), SCHEMA))
    client = AthenaSparkClient(spark)
    client.register_snapshot_table("fz_fuzz", tdir)  # gen_statement targets fz_fuzz

    problems: list[str] = []
    stmts: list[str] = []
    next_id = [500 + seq_no % 5]
    checkpoints: list[tuple[int, dt.datetime, list[tuple]]] = []
    snap0 = table.snapshots()[-1]
    checkpoints.append(
        (snap0.snapshot_id, snap0.committed_at, _state(client, "fz_fuzz"))
    )
    for _ in range(rng.randrange(3, 8)):
        st = gen_statement(rng, next_id)
        stmts.append(st["sql"])
        if st["kind"] == "lossy":
            # ill-typed by construction: the client must refuse and the
            # table must be unchanged — no checkpoint to record
            try:
                client.execute(st["sql"])
                problems.append(f"lossy statement ACCEPTED: {st['sql']}")
                break
            except QueryError as exc:
                if "cannot coerce" not in str(exc):
                    problems.append(
                        f"lossy refusal with wrong error: {exc}\n  sql: {st['sql']}"
                    )
                    break
            continue
        try:
            client.execute(st["sql"])
        except QueryError as exc:
            if "matched more than one source row" not in str(exc):
                problems.append(f"unexpected QueryError: {exc}\n  sql: {st['sql']}")
                break
        snap = table.snapshots()[-1]
        checkpoints.append(
            (snap.snapshot_id, snap.committed_at, _state(client, "fz_fuzz"))
        )

    for i, (vid, ts, want) in enumerate(checkpoints):
        for clause in (
            f"FOR VERSION AS OF {vid}",
            f"FOR TIMESTAMP AS OF TIMESTAMP '{_ts_literal(ts)}'",
        ):
            try:
                got = _state(client, f"fz_fuzz {clause}")
            except (QueryError, EngineError) as exc:
                problems.append(
                    f"checkpoint {i} {clause}: unexpected refusal {exc}\n"
                    f"  sequence: {stmts}"
                )
                continue
            if got != want:
                problems.append(
                    f"checkpoint {i} {clause}: state divergence\n"
                    f"  got {got[:4]}...\n  want {want[:4]}...\n"
                    f"  sequence: {stmts}"
                )
    before = checkpoints[0][1] - dt.timedelta(microseconds=1)
    try:
        client.query(
            f"SELECT * FROM fz_fuzz FOR TIMESTAMP AS OF TIMESTAMP "
            f"'{_ts_literal(before)}'"
        )
        problems.append("pre-history timestamp did not refuse")
    except (QueryError, EngineError):
        pass
    return problems


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mode = "merge-on-read" if "--mor" in sys.argv[1:] else "copy-on-write"
    n = int(args[0]) if len(args) > 0 else 30
    seed = int(args[1]) if len(args) > 1 else 0
    spark = get_spark(
        app_name="fuzz_dml_travel", master="local[8]", shuffle_partitions=2
    )
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="fuzz_dmltvl_")
    t0 = time.time()
    failures = 0
    try:
        for i in range(n):
            problems = run_sequence(spark, i, seed, workdir, delete_mode=mode)
            if problems:
                failures += 1
                print(f"FAIL case {i}:")
                for p in problems:
                    print("  " + p)
            if (i + 1) % 10 == 0:
                print(
                    f"  ...{i + 1}/{n} sequences, {failures} failures, "
                    f"{time.time() - t0:.0f}s",
                    flush=True,
                )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    print(
        f"fuzz_dml_travel: {n} sequences, seed {seed}, delete_mode={mode}: "
        f"{n - failures} agree, {failures} diverge ({time.time() - t0:.0f}s)"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
