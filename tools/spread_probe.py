#!/usr/bin/env python
"""Per-query A/B probe for scan spreading (round 16 optimization).

Times registry queries bench-style (noop sink) with ``spread`` forced OFF
and ON, interleaved within ONE boot (off,on,off,on per query) so JVM/JIT
warm-up affects both arms equally. Reports min per arm.

    python tools/spread_probe.py dd11_semantic_dedup cu06_boilerplate_removal
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trino_iceberg_spark.queries.registry import QUERIES, load_all  # noqa: E402
from trino_iceberg_spark.session import get_spark  # noqa: E402
from trino_iceberg_spark.sources import testdata  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_REAL = testdata.load_table
_FORCE = {"on": False}


@functools.wraps(_REAL)
def _patched(spark, sf_dir, name, *, spread=False):
    return _REAL(spark, sf_dir, name, spread=_FORCE["on"] or spread)


def _install() -> None:
    testdata.load_table = _patched
    for modname, mod in list(sys.modules.items()):
        if modname.startswith("trino_iceberg_spark") and getattr(mod, "load_table", None) is _REAL:
            mod.load_table = _patched


def main() -> None:
    load_all()
    _install()
    names = sys.argv[1:]
    reps = int(os.environ.get("REPS", "2"))
    spark = get_spark(app_name="spread-probe")
    try:
        import pyspark.sql.functions as F

        warm = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
        (
            warm.groupBy("n_regionkey")
            .agg(F.sum(F.col("n_nationkey").cast("decimal(18,4)")).alias("s"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        for name in names:
            arms: dict[str, list[float]] = {"off": [], "on": []}
            for _ in range(reps):
                for arm in ("off", "on"):
                    _FORCE["on"] = arm == "on"
                    spark.catalog.clearCache()
                    t0 = time.time()
                    df = QUERIES[name](spark, SF_DIR)
                    df.write.format("noop").mode("overwrite").save()
                    arms[arm].append(round(time.time() - t0, 3))
            print(
                json.dumps(
                    {
                        "query": name,
                        "off": min(arms["off"]),
                        "on": min(arms["on"]),
                        "off_all": arms["off"],
                        "on_all": arms["on"],
                    }
                ),
                flush=True,
            )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
