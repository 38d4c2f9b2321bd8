"""trino_iceberg_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the capabilities of the reference stack
``sergeytiron/trino-iceberg`` (Trino 478 + Nessie Iceberg catalog + MinIO,
driven by an Athena-style typed SQL client — see SURVEY.md):

- :mod:`.client` — ``AthenaClient``-equivalent typed query API
  (query / query_scalar / execute / unload) over ``spark.sql``.
- :mod:`.fs` — local-FS object-store client with the reference's 6-verb
  S3 surface.
- :mod:`.catalog` — snapshot-versioned parquet tables ("iceberg-lite")
  giving Iceberg-style commits, time travel and maintenance without the
  Iceberg runtime jar.
- :mod:`.operators` — large-scale pipeline operators: dedup (exact,
  MinHash-LSH, SimHash, n-gram Jaccard, embedding), similarity search,
  text analysis, multimodal column plumbing, as-of/range joins.
- :mod:`.queries` — the full declared query inventory (reference SQL
  surface + TPC-H-style analytics + pipeline ops) with DuckDB oracles.
- :mod:`.streaming` — Structured Streaming event analytics.

All relational computation is delegated to Catalyst/Tungsten; this package
is the API surface, table lifecycle, and the extension operators — exactly
the split the reference makes with Trino (SURVEY.md §3).
"""

from __future__ import annotations

from .client import AthenaSparkClient, QueryError, UnloadError, UnloadResponse
from .fs import FsClient, ObjectInfo
from .scripts import run_init_scripts, run_script, run_script_file
from .session import get_spark, stop_spark

__all__ = [
    "AthenaSparkClient",
    "FsClient",
    "ObjectInfo",
    "QueryError",
    "UnloadError",
    "UnloadResponse",
    "get_spark",
    "run_init_scripts",
    "run_script",
    "run_script_file",
    "stop_spark",
]
__version__ = "0.1.0"
