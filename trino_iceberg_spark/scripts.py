"""Convention-based init-script runner.

Port of ``ExecuteInitScriptsAsync``
(/root/reference/tests/IntegrationTests/TrinoIcebergStack.cs:152-197): run
every ``create/*.sql`` then every ``insert/*.sql``, each folder in
alphabetical order, splitting multi-statement files on ``;`` (quote-aware —
B19). The reference execs the Trino CLI inside the container; here each
statement is simply handed to ``spark.sql``.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession

from .formatting import split_statements

__all__ = ["run_init_scripts", "run_script_file", "run_script"]


def run_script(spark: SparkSession, script: str) -> int:
    """Execute a (possibly multi-statement) SQL string; returns #statements."""
    stmts = split_statements(script)
    for stmt in stmts:
        spark.sql(stmt).collect()
    return len(stmts)


def run_script_file(spark: SparkSession, path: str) -> int:
    with open(path, "r", encoding="utf-8") as fh:
        return run_script(spark, fh.read())


def run_init_scripts(spark: SparkSession, scripts_dir: str) -> list[str]:
    """DDL (`create/`) then DML (`insert/`), alphabetical within each —
    exactly the reference's convention (TrinoIcebergStack.cs:152-167)."""
    executed: list[str] = []
    for sub in ("create", "insert"):
        for path in sorted(glob.glob(os.path.join(scripts_dir, sub, "*.sql"))):
            run_script_file(spark, path)
            executed.append(path)
    return executed
