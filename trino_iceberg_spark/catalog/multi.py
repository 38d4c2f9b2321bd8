"""Multi-table catalog with atomic cross-table commits — the Nessie model.

The reference's catalog is Nessie (docker-compose.yml pins it next to
Trino), whose distinctive capability beyond a plain Iceberg catalog is
GIT-LIKE MULTI-TABLE COMMITS: several tables change together or not at
all, and any historical catalog version is a CONSISTENT cross-table
snapshot. Single-table Iceberg gives per-table atomicity only; moving
rows between two tables exposes readers to a window where the row is in
both or neither.

This module reimplements that contract over :class:`SnapshotTable`:

- a catalog is a directory of snapshot tables plus a ``catalog/
  versions.json`` commit log; each catalog version maps table name →
  snapshot id;
- ``transaction()`` stages per-table commits (they write table manifests
  immediately — cheap, invisible) and publishes ONE catalog version at
  the end via atomic rename. Catalog readers resolve every table through
  the catalog version, so they see the old state until the single
  publish instant, and the new state after — all tables at once;
- ``read(name, version=...)`` time-travels the whole catalog: version N
  is the exact cross-table state after commit N (Nessie's commit-hash
  reads).

A failed transaction body leaves staged table snapshots behind (like
Iceberg orphaned snapshots after a failed Nessie commit) but the catalog
never references them — `SnapshotTable.expire_snapshots` reclaims them.
At 100 TB nothing here scales with data: a catalog commit is one JSON
rename regardless of how many bytes the staged snapshots cover.
"""

from __future__ import annotations

import json
import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from ..errors import EngineError
from .snapshots import SnapshotTable, fs_lock

__all__ = ["MultiTableCatalog"]


class MultiTableCatalog:
    def __init__(self, spark: SparkSession, root_dir: str):
        self.spark = spark
        self.root_dir = os.path.abspath(root_dir)
        self.versions_path = os.path.join(self.root_dir, "catalog", "versions.json")

    # -- commit log ------------------------------------------------------
    def _load_versions(self) -> list[dict]:
        if os.path.isfile(self.versions_path):
            with open(self.versions_path, "r", encoding="utf-8") as fh:
                return json.load(fh)
        return []

    def _append_version(self, tables: dict[str, int], message: str) -> int:
        # Read-modify-write of the commit log under the same atomic
        # primitive single-table commits use (snapshots.fs_lock): two
        # concurrent catalog transactions serialize instead of the second
        # os.replace silently erasing the first's version entry. The
        # carry-forward of tables UNTOUCHED by this commit happens in
        # here, against the versions read under the lock — reading
        # versions[-1] outside it would revert a concurrent
        # transaction's table to its pre-commit snapshot in the new
        # version (the other half of the lost-update bug). The lock
        # covers one JSON write — independent of data size, like every
        # commit point in this catalog.
        with fs_lock(self._catalog_lock_path()):
            return self._append_version_locked(tables, message)

    def _catalog_lock_path(self) -> str:
        os.makedirs(os.path.dirname(self.versions_path), exist_ok=True)
        return os.path.join(os.path.dirname(self.versions_path), ".catalog.lock")

    def _append_version_locked(self, tables: dict[str, int], message: str) -> int:
        """The version-log append body; caller holds the catalog lock
        (``_append_version`` for standalone appends, the transaction
        publish phase when the append is part of a larger atom)."""
        versions = self._load_versions()
        merged = dict(tables)
        if versions:
            for tname, sid in versions[-1]["tables"].items():
                merged.setdefault(tname, sid)
        vid = (versions[-1]["version"] + 1) if versions else 1
        versions.append({"version": vid, "message": message, "tables": merged})
        tmp = self.versions_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(versions, fh)
        os.replace(tmp, self.versions_path)  # the single atomic publish point
        return vid

    def current_version(self) -> int:
        versions = self._load_versions()
        return versions[-1]["version"] if versions else 0

    # -- tables ----------------------------------------------------------
    def table(self, name: str) -> SnapshotTable:
        return SnapshotTable(self.spark, os.path.join(self.root_dir, name))

    def _resolve(self, name: str, version: int | None) -> int:
        versions = self._load_versions()
        if not versions:
            raise EngineError(f"catalog {self.root_dir} has no commits")
        if version is None:
            chosen = versions[-1]
        else:
            by_id = {v["version"]: v for v in versions}
            if version not in by_id:
                raise EngineError(
                    f"catalog version {version} not found in {self.root_dir}"
                )
            chosen = by_id[version]
        if name not in chosen["tables"]:
            raise EngineError(
                f"table {name!r} not in catalog version {chosen['version']}"
            )
        return chosen["tables"][name]

    def read(self, name: str, version: int | None = None) -> DataFrame:
        """Read ``name`` at a catalog version (default: latest). Reads at
        the same version across tables are mutually CONSISTENT — they come
        from one atomic commit."""
        return self.table(name).read_version(self._resolve(name, version))

    # -- transactions ----------------------------------------------------
    @contextmanager
    def transaction(self, message: str = ""):
        """Atomic multi-table commit::

            with catalog.transaction("move rows") as txn:
                txn.overwrite("src", remaining_df)
                txn.append("dst", moved_df)
            # ← both visible here, neither before

        The body stages table commits on a per-transaction throwaway
        BRANCH of each touched table (never on main), and publishes ONE
        catalog version on successful exit, fast-forwarding each table's
        main to its staging head first. An exception inside the body
        publishes nothing AND leaves every table's main untouched — the
        staging refs are dropped, so the next transaction chains off the
        last good state and ``expire_snapshots`` reclaims the aborted
        commits (the Nessie abandoned-branch model)."""
        txn = _Transaction(self)
        try:
            yield txn
        except BaseException:
            txn._drop_staging_refs()
            raise
        try:
            self._publish_transaction(txn, message)
        except BaseException:
            txn._drop_staging_refs()
            raise
        txn._drop_staging_refs()

    def _publish_transaction(self, txn: "_Transaction", message: str) -> None:
        """The transaction commit point, made a single atom: under the
        CATALOG lock (serializing transactions) plus EVERY touched
        table's commit lock in sorted-name order (keeping direct
        single-table writers out of the window; the fixed order makes
        deadlock impossible), CAS-check each table's main against the
        snapshot the transaction branched from, then — only if every
        check passed — move all pointers and append the catalog version.
        A conflict therefore publishes NOTHING (no partial cross-table
        state), exactly Nessie's all-or-nothing multi-table commit; the
        caller drops the staging refs and the transaction can re-run
        against the new state. Lock hold is O(tables) JSON writes —
        independent of data size."""
        from contextlib import ExitStack

        from .snapshots import CommitConflictError

        names = sorted(txn.staged)
        with ExitStack() as stack:
            stack.enter_context(fs_lock(self._catalog_lock_path()))
            tables = {n: self.table(n) for n in names}
            for n in names:
                stack.enter_context(tables[n]._commit_lock())
            for n in names:  # all checks BEFORE any pointer moves
                head = tables[n]._branch_head("main")
                head_id = head.snapshot_id if head else None
                if head_id != txn._base[n]:
                    raise CommitConflictError(
                        f"multi-table transaction conflict on table {n!r}: "
                        f"main advanced from {txn._base[n]} to {head_id} "
                        f"since the transaction branched — re-run the "
                        f"transaction against the current state"
                    )
            for n in names:
                t = tables[n]
                refs = t._load_refs()
                refs["branches"]["main"] = txn.staged[n]
                t._save_refs(refs)
            # untouched tables are carried forward inside the version
            # append, against the log read under the same catalog lock
            self._append_version_locked(dict(txn.staged), message)


class _Transaction:
    def __init__(self, catalog: MultiTableCatalog):
        import uuid

        self.catalog = catalog
        self.branch = f"_txn_{uuid.uuid4().hex[:12]}"
        self.staged: dict[str, int] = {}
        self._touched: set[str] = set()
        self._base: dict[str, int | None] = {}

    def _stage(self, name: str, df: DataFrame, op: str, kwargs) -> None:
        table = self.catalog.table(name)
        if name not in self._touched:
            head = table.current_snapshot()
            # the base this transaction branched from — publish CAS-checks
            # each table's main against it, so a concurrent transaction's
            # (or direct writer's) commits are never silently erased
            self._base[name] = head.snapshot_id if head is not None else None
            if head is not None:
                # branch off the table's current main head; on an empty
                # table the first commit creates the branch (allow_create)
                # and pins main at its explicit empty state
                table.create_branch(self.branch, from_snapshot_id=head.snapshot_id)
            self._touched.add(name)
        method = table.append if op == "append" else table.overwrite
        # Commits chain off the previously staged state within the same
        # transaction (two appends to one table compose) via the branch head.
        self.staged[name] = method(
            df, branch=self.branch, allow_create=True, **kwargs
        ).snapshot_id

    def append(self, name: str, df: DataFrame, **kwargs) -> None:
        self._stage(name, df, "append", kwargs)

    def overwrite(self, name: str, df: DataFrame, **kwargs) -> None:
        self._stage(name, df, "overwrite", kwargs)

    def _drop_staging_refs(self) -> None:
        for name in self._touched:
            try:
                self.catalog.table(name).drop_ref(self.branch)
            except EngineError:
                pass  # branch never materialized (abort before first commit)
