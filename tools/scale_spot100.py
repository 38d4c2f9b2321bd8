#!/usr/bin/env python
"""Second-decade scale spot-run (round-9 VERDICT item #5): the three
fastest-growing curves from the 10x run — dd03 (7.1x), ss03 (8.3x),
dd11 (6.3x) — pushed to 100x sf0.1 (~60M lineitem-equivalent, 500k
documents, 200k embeddings) so any super-linear bend in band-bucket
occupancy, cell-count derivation, or the viral-gram reduce shows up as
a wall-clock curve across sf0.1 -> 10x -> 100x in ONE session.

What runs at 100x:
- ``dd03_minhash_lsh_pairs``: the registry entry as-is (banded
  equi-join; band-bucket occupancy + viral-shingle cap are the paths
  under test).
- ``ss03_production`` / ``dd11_production`` / ``ss14_production``:
  the ivf_topk / semantic_dedup_pairs / pq_adc_topk OPERATORS in
  production sizing — ``num_cells`` DERIVED from the corpus (the
  `_derived_num_cells` path) instead of the oracle-pinned 8/16 cells
  the registry entries carry. The pinned
  variants are quadratic BY CONSTRUCTION (fixed cell count => cell
  size grows with n => pair work ~n^2/cells — same documented status
  as ss01's exact baseline); the derived path holds pair work at
  ~n x target_cell_size, which is the claim a second decade can bend
  and therefore the one worth measuring.

The 100x corpus reuses tools/scale_spot.py's honest synthesis
(collision-free key shifts, cross-replica word-tagging) with ONE
extension: at 100 replicas a pure rotation no longer decorrelates
embeddings (rotations repeat past r=64, so replicas r and r-64 would
be bit-identical => secret duplicate mass). Replicas r >= 64 therefore
additionally negate odd positions after rotating by r % 64 — a signed
permutation, i.e. an orthogonal transform: norms and ALL within-replica
cosines are preserved exactly, while cross-replica cosine between the
flipped and unflipped family is (sum_even - sum_odd)/1 ~ 0 for random
vectors. The build self-checks both properties on a sample.

Usage:
    python tools/scale_spot100.py            # build if missing + run
    python tools/scale_spot100.py --regen    # force data rebuild
Prints one JSON line per entry plus a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_spot import SRC, build as build10  # noqa: E402

DST10 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1.0")
DST100 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/sf10")
REPLICAS = 100
SHIFT = 10_000_000


def build100(dst: str) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.sql("SET threads TO 16")

    def emit(sql: str, table: str) -> None:
        out = os.path.join(dst, f"{table}.parquet")
        con.sql(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET, COMPRESSION ZSTD)")
        n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"  built {table}: {n} rows", flush=True)

    rep = f"(SELECT unnest(range({REPLICAS})) AS r)"
    for t in ("region", "nation"):
        emit(f"SELECT * FROM '{SRC}/{t}.parquet'", t)
    emit(
        f"SELECT c_custkey + r*{SHIFT} AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet', {rep}",
        "customer",
    )
    emit(
        f"SELECT s_suppkey + r*{SHIFT} AS s_suppkey, s_name, s_nationkey, "
        f"s_acctbal FROM '{SRC}/supplier.parquet', {rep}",
        "supplier",
    )
    emit(
        f"SELECT p_partkey + r*{SHIFT} AS p_partkey, p_name, p_brand, "
        f"p_type, p_size, p_retailprice FROM '{SRC}/part.parquet', {rep}",
        "part",
    )
    emit(
        f"SELECT o_orderkey + r*{SHIFT} AS o_orderkey, "
        f"o_custkey + r*{SHIFT} AS o_custkey, o_orderstatus, o_totalprice, "
        f"o_orderdate, o_orderpriority FROM '{SRC}/orders.parquet', {rep}",
        "orders",
    )
    emit(
        f"SELECT l_orderkey + r*{SHIFT} AS l_orderkey, "
        f"l_partkey + r*{SHIFT} AS l_partkey, "
        f"l_suppkey + r*{SHIFT} AS l_suppkey, l_linenumber, l_quantity, "
        f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        f"l_shipdate FROM '{SRC}/lineitem.parquet', {rep}",
        "lineitem",
    )
    emit(
        f"SELECT event_id + r*{SHIFT} AS event_id, ts, "
        f"user_id + r*{SHIFT} AS user_id, event_type, value, props "
        f"FROM '{SRC}/events.parquet', {rep}",
        "events",
    )
    emit(
        f"""
        SELECT doc_id + r*{SHIFT} AS doc_id,
               CASE WHEN r = 0 THEN text
                    ELSE array_to_string(
                        list_transform(string_split(text, ' '),
                            (w, i) -> CASE WHEN i % 3 = 1
                                      THEN w || '~' || r ELSE w END),
                        ' ')
               END AS text,
               lang, source,
               CAST(length(CASE WHEN r = 0 THEN text
                    ELSE array_to_string(
                        list_transform(string_split(text, ' '),
                            (w, i) -> CASE WHEN i % 3 = 1
                                      THEN w || '~' || r ELSE w END),
                        ' ') END) AS BIGINT) AS n_chars
        FROM '{SRC}/documents.parquet', {rep}
        """,
        "documents",
    )
    # signed rotation (see module docstring): rotate by r % 64, negate
    # odd positions for r >= 64 — orthogonal per replica, decorrelated
    # across replicas even past the rotation period
    emit(
        f"""
        SELECT vec_id + r*{SHIFT} AS vec_id,
               CASE WHEN r = 0 THEN embedding
                    ELSE list_transform(
                        embedding[(r % 64)+1:] || embedding[:(r % 64)],
                        (x, i) -> CASE WHEN r >= 64 AND i % 2 = 0
                                  THEN -x ELSE x END)
               END AS embedding,
               label
        FROM '{SRC}/embeddings.parquet', {rep}
        """,
        "embeddings",
    )
    # Honesty self-check on the synthesized vectors: within-replica
    # cosine structure preserved EXACTLY, cross-replica (incl. the
    # r/r+64 pair a pure rotation would alias) collapsed.
    checks = con.sql(
        f"""
        WITH e AS (SELECT vec_id, embedding FROM '{dst}/embeddings.parquet'),
        norm0 AS (
          SELECT max(abs(list_sum(list_transform(a.embedding,
                     (x, i) -> x * b.embedding[i]))
                 - list_sum(list_transform(c.embedding,
                     (x, i) -> x * d.embedding[i])))) AS max_drift
          FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
          JOIN e c ON c.vec_id = a.vec_id + 70*{SHIFT}
          JOIN e d ON d.vec_id = b.vec_id + 70*{SHIFT}
          WHERE a.vec_id < 50
        ),
        cross64 AS (
          SELECT max(abs(list_sum(list_transform(a.embedding,
                     (x, i) -> x * b.embedding[i]))
                 / (sqrt(list_sum(list_transform(a.embedding, x -> x*x)))
                    * sqrt(list_sum(list_transform(b.embedding, x -> x*x))))))
                 AS max_alias_cos
          FROM e a JOIN e b ON b.vec_id = a.vec_id + 64*{SHIFT}
          WHERE a.vec_id < 200
        )
        SELECT norm0.max_drift, cross64.max_alias_cos FROM norm0, cross64
        """
    ).fetchone()
    print(
        f"  synthesis check: within-replica dot drift {checks[0]:.2e} "
        f"(exact-preservation), r/r+64 alias cosine max {checks[1]:.3f} "
        f"(pure rotation would be 1.0)",
        flush=True,
    )
    if checks[0] > 1e-9 or checks[1] > 0.9:
        raise SystemExit("synthesized 100x embeddings failed honesty check")
    con.close()


def _production_entries():
    from pyspark.sql import functions as F

    from trino_iceberg_spark.operators import similarity as S

    def _emb(spark, d):
        return spark.read.parquet(os.path.join(d, "embeddings.parquet"))

    def ss03_production(spark, d):
        e = _emb(spark, d)
        q = e.filter(F.col("vec_id") % 50 == 0)
        return S.ivf_topk(
            e, q, "embedding", "vec_id", k=5, num_cells=None, nprobe=3,
            target_cell_size=1000,
        )

    def dd11_production(spark, d):
        e = _emb(spark, d)
        return S.semantic_dedup_pairs(
            e, "embedding", "vec_id", threshold=0.9, num_cells=None,
            max_cell_size=5000,
        )

    def ss14_production(spark, d):
        # IVF-PQ in production sizing (derived cells) — the round-9
        # operator's own empirical scale point: per-query work pinned at
        # nprobe x target_cell_size CODES (m-byte lookups, not vectors)
        e = _emb(spark, d)
        q = e.filter(F.col("vec_id") % 50 == 0)
        return S.pq_adc_topk(
            e, q, "embedding", "vec_id", k=5, m=8, ksub=16,
            num_cells=None, nprobe=3, target_cell_size=1000,
        )

    return {
        "ss03_production": ss03_production,
        "dd11_production": dd11_production,
        "ss14_production": ss14_production,
    }


def main() -> int:
    if "--regen" in sys.argv:
        for d in (DST10, DST100):
            if os.path.isdir(d):
                shutil.rmtree(d)
    for d, builder, label in ((DST10, build10, "10x"), (DST100, build100, "100x")):
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            print(f"building {label} scale-up at {d} ...", flush=True)
            t0 = time.time()
            builder(d)
            print(f"  built in {time.time() - t0:.0f}s", flush=True)

    from trino_iceberg_spark.queries.registry import QUERIES, load_all
    from trino_iceberg_spark.session import get_spark

    load_all()
    entries = {"dd03_minhash_lsh_pairs": QUERIES["dd03_minhash_lsh_pairs"]}
    entries.update(_production_entries())

    spark = get_spark(app_name="scale_spot100")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    try:
        spark.read.parquet(os.path.join(SRC, "nation.parquet")).write.format(
            "noop"
        ).mode("overwrite").save()
        for name, fn in entries.items():
            row = {}
            for label, d in (("sf0.1", SRC), ("10x", DST10), ("100x", DST100)):
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                row[label] = round(time.time() - t0, 2)
            row["ratio_10x"] = round(row["10x"] / row["sf0.1"], 2)
            row["ratio_100x_vs_10x"] = round(row["100x"] / row["10x"], 2)
            results[name] = row
            print(json.dumps({name: row}), flush=True)
    finally:
        spark.stop()
    print(
        json.dumps(
            {
                "metric": "scale_spot_100x",
                "entries": results,
                "max_second_decade_ratio": max(
                    r["ratio_100x_vs_10x"] for r in results.values()
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
