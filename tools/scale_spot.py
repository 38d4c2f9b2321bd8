#!/usr/bin/env python
"""One-order-of-magnitude scale spot-run (round-8 VERDICT item #6).

Every scale argument in SCALE.md is design-reasoning verified at sf0.1
(~600k lineitem rows). This tool builds a 10x scale-up (sf1.0-shaped,
~6M lineitem) in a scratch dir and runs the heaviest registry entries
at BOTH sf0.1 and the scale-up in the same session, so the wall-time
ratio directly exposes any super-linear cliff (skew-guard thresholds,
packer group sizes, AQE coalesce behavior, viral-shingle caps).

The scale-up is derived from the read-only driver data (never modified)
by replicating each fact table 10x with collision-free key shifts —
NOT naive row duplication, which would be dishonest for dedup/ANN
workloads:

- ``documents``: replica 0 is verbatim; replicas 1-9 suffix every 3rd
  word with ``~<r>`` (and recompute ``n_chars``), so within-replica
  duplicate/near-duplicate structure is EXACTLY the sf0.1 structure
  (scaled linearly) while cross-replica shingle Jaccard collapses to
  ~(2/3)^k — without this, every sf0.1 near-dup pair would fan out into
  ~45 cross-replica pairs and the "10x data" run would secretly be a
  100x-pairs run.
- ``embeddings``: replicas rotate the vector by r positions — norms
  and within-replica cosine structure preserved, cross-replica cosine
  decorrelated (same reasoning as above for ANN top-k).
- TPC-H facts (customer/supplier/part/orders/lineitem): all join keys
  shifted by ``r * 10_000_000`` so FK joins stay consistent and key
  cardinality scales 10x. ``nation``/``region`` stay fixed (TPC-H
  semantics: dimension tables don't scale).
- ``events``: ids shifted, timestamps kept — event-time density scales
  10x, which is what a 10x stream actually looks like to windows.

Usage:
    python tools/scale_spot.py            # build if missing + run
    python tools/scale_spot.py --regen    # force rebuild of the data
Prints one JSON line per entry plus a summary JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1.0")
REPLICAS = 10
SHIFT = 10_000_000

#: The 10 heaviest entries per BENCH_r07 + the round-7 flagship set,
#: plus the exact-vs-bucketed similarity pairs (ss01/ss12 are quadratic
#: BY CONSTRUCTION — query set scales with sf — while ss02/ss03/ss04/
#: ss13 are their documented scale paths; the run shows the contrast).
SPOT_ENTRIES = [
    "cu06_boilerplate_removal",
    "cu07_end_to_end_pipeline",
    "dd03_minhash_lsh_pairs",
    "dd07_duplicate_clusters",
    "dd11_semantic_dedup",
    "dd12_passage_dedup",
    "mm08_multimodal_to_shards",
    "sp10_corpus_to_shards",
    "ss01_cosine_topk",
    "ss02_lsh_topk",
    "ss03_ivf_topk",
    "ss04_numpy_topk",
    "ss12_mmr_rerank",
    "ss13_mmr_rerank_lsh",
    "tpch_q1_pricing_summary",
]


def build(dst: str) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.sql("SET threads TO 16")

    def emit(sql: str, table: str) -> None:
        out = os.path.join(dst, f"{table}.parquet")
        con.sql(
            f"COPY ({sql}) TO '{out}' (FORMAT PARQUET, COMPRESSION ZSTD)"
        )
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
    emit(
        f"""
        SELECT vec_id + r*{SHIFT} AS vec_id,
               CASE WHEN r = 0 THEN embedding
                    ELSE embedding[r+1:] || embedding[:r] END AS embedding,
               label
        FROM '{SRC}/embeddings.parquet', {rep}
        """,
        "embeddings",
    )
    con.close()


def main() -> int:
    if "--regen" in sys.argv and os.path.isdir(DST):
        shutil.rmtree(DST)
    if not os.path.isdir(DST) or not os.path.exists(
        os.path.join(DST, "embeddings.parquet")
    ):
        print(f"building 10x scale-up at {DST} ...", flush=True)
        t0 = time.time()
        build(DST)
        print(f"  built in {time.time() - t0:.0f}s", flush=True)

    from trino_iceberg_spark.queries.registry import QUERIES, load_all
    from trino_iceberg_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="scale_spot")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    try:
        # tiny warmup (JVM/codegen), same as bench.py
        spark.read.parquet(os.path.join(SRC, "nation.parquet")).write.format(
            "noop"
        ).mode("overwrite").save()
        for name in SPOT_ENTRIES:
            row = {}
            for label, d in (("sf0.1", SRC), ("sf1.0", DST)):
                t0 = time.time()
                QUERIES[name](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                row[label] = round(time.time() - t0, 2)
            row["ratio"] = round(row["sf1.0"] / row["sf0.1"], 2)
            results[name] = row
            print(json.dumps({name: row}), flush=True)
    finally:
        spark.stop()
    ratios = [r["ratio"] for r in results.values()]
    print(
        json.dumps(
            {
                "metric": "scale_spot_10x",
                "entries": results,
                "max_ratio": max(ratios),
                "median_ratio": sorted(ratios)[len(ratios) // 2],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
