#!/usr/bin/env python
"""Registry-wide physical-plan audit — the scale-anti-pattern sweep.

For every ``__spark_entry__.queries()`` entry, plans the DataFrame at
$SF_DIR (default sf0.01) and scans the executed-plan string for the
shapes that kill 100 TB runs:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — non-equi or
  accidental cross joins (each must be deliberate and bounded);
- ``Window`` over ``SinglePartition`` — an unpartitioned window pulls the
  whole input through one task;
- row-at-a-time Python UDFs (``BatchEvalPython``) — the slow path this
  repo bans (Arrow ``mapInPandas``/``ArrowEvalPython`` is fine).

Known-deliberate occurrences are allowlisted with the reason inline, so
CI-style output is "clean or explained": any NEW offender prints loudly.

Usage: python tools/audit_plans.py [entry ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from trino_iceberg_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")

#: entry -> {pattern: reason} for deliberate, bounded occurrences. Three
#: recurring shapes, each fine at 100 TB because the broadcast side is
#: constant-sized by construction:
#:   scalar-broadcast  — crossJoin(broadcast(1-row aggregate)); Spark
#:                       plans BroadcastNestedLoopJoin for a keyless join
#:   queryset-broadcast— crossJoin(broadcast(small query set)), the
#:                       documented contract of the exact top-k operators
#:   spine-broadcast   — gap-fill time spines built from a broadcast
#:                       (min, max) row
_SCALAR = {"BroadcastNestedLoopJoin": "1-row scalar/stat broadcast crossJoin"}
_QUERYSET = {
    "BroadcastNestedLoopJoin": "small-query-set broadcast (exact top-k contract)"
}
_SPINE = {"BroadcastNestedLoopJoin": "1-row (min,max) spine broadcast"}
ALLOW = {
    "j07_cross_join": {
        "CartesianProduct": "the entry IS the cross-join surface (tiny dims)",
        "BroadcastNestedLoopJoin": "same — broadcast form of the deliberate cross join",
    },
    "j08_range_join": {
        "BroadcastNestedLoopJoin": "non-equi range join demo; rj01 is the "
        "bucketized scale path (operators/joins.py)",
    },
    "w05_ntile_percent": {
        "SinglePartitionWindow": "global decile ranking; guarded by a "
        "pre-filter + row-count assert (queries/windows.py)",
    },
    "sp04_sequence_packing": {
        "SinglePartitionWindow": "offsets window over 256 BUCKET TOTALS, "
        "not data rows — bounded by construction (operators/packing.py)",
    },
    "cu09_token_budget_selection": {
        "SinglePartitionWindow": "exclusive_cumsum bucket-offset window "
        "over 256 x observed-distinct-scores BUCKET TOTALS (prefix len "
        "17 = score + 2 md5 chars), not data rows — bounded because "
        "integer quality scores are coarse (operators/curation.py "
        "select_token_budget)",
    },
    "tpch_q11_important_parts": _SCALAR,
    "tpch_q14_promo_revenue": _SCALAR,
    "tpch_q15_top_supplier": _SCALAR,
    "tpch_q22_global_sales_opportunity": _SCALAR,
    "c02_scalar_subquery": _SCALAR,
    "cu04_length_band_filter": _SCALAR,
    "tx09_tfidf_top_terms": _SCALAR,
    "tx10_bm25_ranking": _SCALAR,
    "tx13_rarity_scores": _SCALAR,
    "ss01_cosine_topk": _QUERYSET,
    "ss12_mmr_rerank": _QUERYSET,  # pool stage is cosine_topk's broadcast
    # cross product; the greedy stage is applyInPandas over pool-sized
    # query groups (operators/similarity.py mmr_rerank)
    "sp12_curriculum_order": {
        "SinglePartitionWindow": "exclusive_cumsum bucket-offset window "
        "over 16^2-per-phase BUCKET TOTALS (prefix len 3 = phase hex + "
        "2 md5 chars), not data rows (operators/splits.py "
        "curriculum_order)",
    },
    "ss10_margin_mining": _QUERYSET,  # two cosine_topk passes, both
    # sides are the small mining populations (swap in lsh/ivf_topk for
    # two LARGE sides — operators/similarity.py margin_mining docstring)
    "ss05_quantized_topk": _QUERYSET,
    "ss07_hard_negatives": _QUERYSET,
    "ir01_retrieval_metrics": _QUERYSET,  # scores ss01's broadcast ranking
    "rag01_retrieval_pipeline": _QUERYSET,  # first-chunk query set is
    # broadcast into the chunk-embedding scan (swap lsh/ivf_topk for
    # large query sets — queries/pipeline.py rag01 docstring)
    "ss08_range_search": _QUERYSET,
    "ev06_hourly_gap_fill": _SPINE,
    "ev11_interpolated_gap_fill": _SPINE,
    "ev15_bloom_prefilter": _SCALAR,  # 1-row 8 KiB bloom bitmap broadcast
    # 1-row gram-total scalars crossJoined into the 4096-row bucket-weight
    # table (and its reuse on both count paths) — all constant-sized
    "cu08_dsir_selection": _SCALAR,
}

PATTERNS = {
    "CartesianProduct": re.compile(r"CartesianProduct"),
    "BroadcastNestedLoopJoin": re.compile(r"BroadcastNestedLoopJoin"),
    "SinglePartitionWindow": re.compile(
        r"Window .*\n(?:.*\n)?\s*\+- \S*Sort.*\n\s*\+- Exchange SinglePartition"
    ),
    "PythonRowUDF": re.compile(r"BatchEvalPython"),
}


def scan(name: str, plan: str) -> list[str]:
    """Unexplained offender lines for one entry."""
    bad = []
    allow = ALLOW.get(name, {})
    for label, pat in PATTERNS.items():
        n = len(pat.findall(plan))
        if n and label not in allow:
            bad.append(f"{label} x{n}")
    return bad


def main() -> None:
    spark = get_spark()
    qs = entrymod.queries()
    # An allowlisted name that no longer exists in the registry is a rotted
    # explanation (round-4 shipped a dead tpch_q14_promo_effect key); fail
    # loudly so the clean-or-explained contract can't silently decay.
    stale = sorted(set(ALLOW) - set(qs))
    if stale:
        print(f"STALE ALLOWLIST KEYS (not in registry): {stale}")
        sys.exit(1)
    names = sys.argv[1:] or list(qs)
    offenders: dict[str, list[str]] = {}
    explained = 0
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            offenders[name] = [f"PLAN-ERROR: {exc}"]
            continue
        bad = scan(name, plan)
        if bad:
            offenders[name] = bad
        elif name in ALLOW:
            explained += 1
    print(f"\naudited {len(names)} entries at {SF_DIR}")
    print(f"allowlisted-and-clean: {explained}")
    if offenders:
        print(f"UNEXPLAINED OFFENDERS ({len(offenders)}):")
        for n, bad in offenders.items():
            print(f"  {n}: {', '.join(bad)}")
        sys.exit(1)
    print("no unexplained scale anti-patterns")


if __name__ == "__main__":
    main()
