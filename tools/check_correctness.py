#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB over the same parquet tables, comparing:
row count, column names, and an order-insensitive canonical value
comparison (exact for ints/strings/bools/dates; floats must match to
full precision — the engine's queries are built to be bit-deterministic,
see trino_iceberg_spark/queries/compat.py).

Usage:
    python tools/check_correctness.py              # all queries @ sf0.01
    python tools/check_correctness.py name1 name2  # subset
    SF_DIR=/root/testdata/sf0.001 python tools/check_correctness.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from tools.canonical import canon_rows  # noqa: E402
from trino_iceberg_spark.session import get_spark  # noqa: E402
from trino_iceberg_spark.sources.testdata import TABLES  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def main(names: list[str]) -> int:
    spark = get_spark(app_name="correctness", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    targets = names or list(queries)
    failures = 0
    for name in targets:
        t0 = time.time()
        try:
            df = queries[name](spark, SF_DIR)
            spark_cols = [c.lower() for c in df.columns]
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(spark_rows)} rows, {time.time()-t0:.1f}s)")
            if len(spark_rows) == 0 and not name.startswith("b03"):
                print(f"      WARNING: 0 rows from {name}")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = [c.lower() for c in rel.columns]
            duck_types = [str(t).upper() for t in rel.types]
            duck_rows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = []
        # DECIMAL at the output boundary is a lint FAILURE: the driver's
        # value hash is type-sensitive, so Decimal('194.2800') vs the
        # oracle's 194.28 hash-mismatches even when numerically equal
        # (this is exactly what shipped ev14/st10 red in round 4 while
        # canon()'s normalize() said green). Convention: cast final sums
        # to DOUBLE on BOTH sides (see ev08).
        spark_dec = [
            f.name for f in df.schema.fields if f.dataType.typeName().startswith("decimal")
        ]
        duck_dec = [c for c, t in zip(duck_cols, duck_types) if "DECIMAL" in t]
        if spark_dec:
            problems.append(f"lint: DECIMAL in final Spark schema {spark_dec} — cast to double")
        if duck_dec:
            problems.append(f"lint: DECIMAL in oracle result {duck_dec} — CAST(... AS DOUBLE)")
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols spark={spark_cols} duck={duck_cols}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        if not problems:
            cs = canon_rows(spark_cols, spark_rows)
            cd = canon_rows(duck_cols, duck_rows)
            if cs != cd:
                diff_at = next(
                    (i for i, (a, b) in enumerate(zip(cs, cd)) if a != b), None
                )
                detail = ""
                if diff_at is not None:
                    detail = f" first-diff row {diff_at}: spark={cs[diff_at]} duck={cd[diff_at]}"
                problems.append("value mismatch" + detail)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"PASS  {name} ({len(spark_rows)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(targets) - failures}/{len(targets)} passed")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
