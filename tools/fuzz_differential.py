#!/usr/bin/env python
"""Randomized differential testing: generated SQL run on BOTH Spark and
DuckDB over the same parquet tables, results compared as canonical
multisets. The fixed oracle registry pins 213 hand-written queries; this
tool explores the space BETWEEN them — filter/join/group-by/expression
compositions nobody wrote down — so a dialect divergence or planner bug
surfaces as a value mismatch with the reproducing SQL attached.

The grammar deliberately stays inside the deterministic common dialect:
- no LIMIT without total order (results compare as sorted multisets);
- double SUM/AVG route through exact DECIMAL then CAST AS DOUBLE (the
  repo-wide convention — float accumulation order is engine-dependent);
- only expressions both engines define identically (comparisons, IN,
  LIKE 'prefix%' with metacharacter-escaped prefixes, CASE, ||,
  upper/lower/substr/coalesce, date_trunc).

Round-9 shapes: date/time expressions (date_trunc buckets as GROUP BY
keys — CAST AS TIMESTAMP on both sides since DuckDB returns DATE for
timestamp input while Spark returns TIMESTAMP; EXTRACT field keys;
INTERVAL '+k MONTH/DAY' arithmetic in predicates — week truncation and
month-end clamping probed equal before wiring) and three-valued-logic
shapes over REAL null-extended rows (LEFT JOIN with a filtered ON
manufactures NULLs, then IS [NOT] DISTINCT FROM, NULLIF/COALESCE
sentinel keys, and FILTER-counted null-safe comparisons run over them);
deterministic ORDER-BY-PK LIMIT/OFFSET paging windows.

Round-7 shapes: window frames + navigation (LAG/LEAD with defaults,
FIRST_VALUE/LAST_VALUE and bounded ROWS frames, all ordered by the
unique PK so frames are engine-deterministic); conditional aggregation
(CASE-in-SUM and the FILTER (WHERE ...) clause); nested aggregation
over derived tables; uncorrelated IN / NOT IN subqueries on FK links
(inner side projects a non-null key, so NOT IN's NULL-poisoning rule
stays out of play — semi/anti planning is the target).

Grammar shapes (round 6 added the first five): LEFT/FULL OUTER joins
with extra ON predicates so null-extended rows actually occur; set
operations (UNION/INTERSECT/EXCEPT, ALL and DISTINCT); QUALIFY — run
through the CLIENT's rewrite_qualify on the Spark side vs DuckDB's
native QUALIFY, fuzzing the SQL-text rewrite itself; ROLLUP/CUBE/
GROUPING SETS with GROUPING() flags; correlated scalar subqueries in
the SELECT list; plus the original inner-join / chain / EXISTS /
window / grouped-aggregate-with-HAVING (and COUNT DISTINCT) /
scalar-expression shapes.

Usage:
    python tools/fuzz_differential.py            # 100 queries, seed 0
    python tools/fuzz_differential.py 500 7      # 500 queries, seed 7
    SF_DIR=/root/testdata/sf0.001 python tools/fuzz_differential.py

Exit code 1 on any mismatch; each failure prints the SQL for replay.
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from tools.canonical import canon_rows  # noqa: E402
from trino_iceberg_spark.session import get_spark  # noqa: E402
from trino_iceberg_spark.timetravel_sql import rewrite_qualify  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")

# table -> {col: kind}; kinds: int, double, str, ts
SCHEMA = {
    "customer": {
        "c_custkey": "int", "c_name": "str", "c_nationkey": "int",
        "c_acctbal": "double", "c_mktsegment": "str",
    },
    "orders": {
        "o_orderkey": "int", "o_custkey": "int", "o_orderstatus": "str",
        "o_totalprice": "double", "o_orderdate": "ts", "o_orderpriority": "str",
    },
    "lineitem": {
        "l_orderkey": "int", "l_partkey": "int", "l_suppkey": "int",
        "l_linenumber": "int", "l_quantity": "double",
        "l_extendedprice": "double", "l_discount": "double", "l_tax": "double",
        "l_returnflag": "str", "l_linestatus": "str", "l_shipdate": "ts",
    },
    "nation": {"n_nationkey": "int", "n_name": "str", "n_regionkey": "int"},
    "region": {"r_regionkey": "int", "r_name": "str"},
    "part": {
        "p_partkey": "int", "p_name": "str", "p_brand": "str",
        "p_type": "str", "p_size": "int", "p_retailprice": "double",
    },
    "supplier": {
        "s_suppkey": "int", "s_name": "str", "s_nationkey": "int",
        "s_acctbal": "double",
    },
}

# FK joins (left, right, on-condition); prefixed TPC-H names never collide.
JOINS = [
    ("orders", "customer", "o_custkey = c_custkey"),
    ("lineitem", "orders", "l_orderkey = o_orderkey"),
    ("customer", "nation", "c_nationkey = n_nationkey"),
    ("nation", "region", "n_regionkey = r_regionkey"),
    ("lineitem", "part", "l_partkey = p_partkey"),
    ("supplier", "nation", "s_nationkey = n_nationkey"),
]

# 3-table chains: (t1, t2, cond12, t3, cond23)
CHAINS = [
    ("lineitem", "orders", "l_orderkey = o_orderkey", "customer", "o_custkey = c_custkey"),
    ("customer", "nation", "c_nationkey = n_nationkey", "region", "n_regionkey = r_regionkey"),
    ("supplier", "nation", "s_nationkey = n_nationkey", "region", "n_regionkey = r_regionkey"),
]

# unique primary key per table — deterministic window order keys
PK = {
    "customer": "c_custkey", "orders": "o_orderkey", "nation": "n_nationkey",
    "region": "r_regionkey", "part": "p_partkey", "supplier": "s_suppkey",
}

# (outer table, correlated EXISTS inner table, correlation condition)
EXISTS_LINKS = [
    ("customer", "orders", "o_custkey = c_custkey"),
    ("orders", "lineitem", "l_orderkey = o_orderkey"),
    ("nation", "customer", "c_nationkey = n_nationkey"),
]

# low-cardinality columns usable as GROUP BY keys
GROUP_KEYS = {
    "customer": ["c_mktsegment", "c_nationkey"],
    "orders": ["o_orderstatus", "o_orderpriority"],
    "lineitem": ["l_returnflag", "l_linestatus", "l_linenumber"],
    "nation": ["n_name", "n_regionkey"],
    "region": ["r_name"],
    "part": ["p_brand", "p_size"],
    "supplier": ["s_nationkey"],
}


def _sample_pools(con) -> dict:
    """Literal pools drawn FROM THE DATA (deterministic — data is fixed):
    numeric quantiles, distinct strings, timestamp range per column."""
    pools = {}
    for tbl, cols in SCHEMA.items():
        for col, kind in cols.items():
            if kind in ("int", "double"):
                q = con.sql(
                    f"SELECT quantile_cont({col}, [0.1, 0.5, 0.9]) FROM {tbl}"
                ).fetchone()[0]
                pools[col] = [round(float(v), 2) for v in q]
            elif kind == "str":
                vals = [
                    r[0]
                    for r in con.sql(
                        f"SELECT DISTINCT {col} FROM {tbl} ORDER BY 1 LIMIT 8"
                    ).fetchall()
                    if r[0] is not None
                ]
                pools[col] = vals or ["x"]
            else:  # ts
                lo, hi = con.sql(f"SELECT MIN({col}), MAX({col}) FROM {tbl}").fetchone()
                pools[col] = (str(lo), str(hi))
    return pools


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _predicate(rng: random.Random, col: str, kind: str, pools: dict) -> str:
    if kind in ("int", "double"):
        v = rng.choice(pools[col])
        op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        return f"{col} {op} {v}"
    if kind == "str":
        vals = pools[col]
        mode = rng.randrange(3)
        if mode == 0:
            return f"{col} = {_sql_str(rng.choice(vals))}"
        if mode == 1:
            pick = rng.sample(vals, min(len(vals), rng.randrange(1, 4)))
            return f"{col} IN ({', '.join(_sql_str(v) for v in pick)})"
        # Strip LIKE metacharacters from the data-derived prefix: a raw %
        # or _ would silently change the predicate from prefix-match to
        # wildcard-match, and backslash-escaping is NOT portable (Spark
        # defaults to backslash-escape, DuckDB's LIKE has no default
        # escape character). Stripping keeps the pattern a plain prefix
        # on both engines; if nothing survives, fall back to equality.
        raw = rng.choice(vals)[: rng.randrange(1, 3)]
        prefix = raw.replace("%", "").replace("_", "").replace("\\", "")
        if not prefix:
            return f"{col} = {_sql_str(raw)}"
        return f"{col} LIKE {_sql_str(prefix + '%')}"
    lo, hi = pools[col]
    pick = rng.choice([lo, hi])
    op = rng.choice([">=", "<"])
    return f"{col} {op} TIMESTAMP '{pick}'"


def _scalar_expr(rng: random.Random, tbl_cols: dict, pools: dict) -> tuple[str, str]:
    """(expr SQL, alias) — deterministic cross-engine scalar expressions."""
    col, kind = rng.choice(
        [(c, k) for c, k in tbl_cols.items() if k in ("int", "double", "str")]
    )
    i = rng.randrange(4)
    if kind == "str":
        fn = rng.choice(["upper", "lower"])
        if i == 0:
            return f"{fn}({col})", f"e_{col}"
        if i == 1:
            return f"substr({col}, 1, 3)", f"e_{col}"
        return f"{col} || '_t'", f"e_{col}"
    if i == 0:
        v = rng.choice(pools[col])
        return f"CASE WHEN {col} > {v} THEN 'hi' ELSE 'lo' END", f"e_{col}"
    if i == 1:
        return f"coalesce(CAST({col} AS DOUBLE), 0.0)", f"e_{col}"
    return f"CAST({col} AS DOUBLE) + 1.0", f"e_{col}"


def _aggregate(rng: random.Random, tbl_cols: dict) -> tuple[str, str]:
    nums = [(c, k) for c, k in tbl_cols.items() if k in ("int", "double")]
    col, kind = rng.choice(nums)
    i = rng.randrange(6)
    if i == 5:
        return f"COUNT(DISTINCT {col})", f"a_cd_{col}"
    if i == 0:
        return "COUNT(*)", "a_cnt"
    if i == 1:
        return f"MIN({col})", f"a_min_{col}"
    if i == 2:
        return f"MAX({col})", f"a_max_{col}"
    if i == 3:
        if kind == "int":
            return f"SUM({col})", f"a_sum_{col}"
        # exact decimal sum, double at the boundary (repo convention)
        return (
            f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE)",
            f"a_sum_{col}",
        )
    return (
        f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)",
        f"a_avg_{col}",
    )


def _gen_outer_join(rng: random.Random, pools: dict) -> str:
    """LEFT / FULL OUTER join whose ON clause carries an extra data-derived
    predicate on the right side, so the null-extended rows actually occur —
    probing that both engines agree on NULL propagation through projections,
    IS NULL predicates, grouped COUNT(col) vs COUNT(*), and NULL group keys."""
    left, right, cond = rng.choice(JOINS)
    jt = rng.choice(["LEFT", "LEFT", "FULL"])  # FULL rarer: it's costlier
    rcol, rkind = rng.choice(list(SCHEMA[right].items()))
    extra = _predicate(rng, rcol, rkind, pools)
    from_sql = f"{left} {jt} JOIN {right} ON {cond} AND {extra}"
    mode = rng.randrange(3)
    if mode == 0:
        # projection incl. a nullable right-side column + IS [NOT] NULL test
        proj = rng.sample(list(SCHEMA[left]), 2) + rng.sample(list(SCHEMA[right]), 1)
        where = ""
        if rng.random() < 0.5:
            nullcol = rng.choice(list(SCHEMA[right]))
            neg = "NOT " if rng.random() < 0.5 else ""
            where = f" WHERE {nullcol} IS {neg}NULL"
        return f"SELECT {', '.join(proj)} FROM {from_sql}{where}"
    if mode == 1:
        # grouped: COUNT(right col) counts only matched rows, COUNT(*) all
        gk = rng.choice(GROUP_KEYS[left])
        cnt_col = rng.choice(list(SCHEMA[right]))
        return (
            f"SELECT {gk}, COUNT(*) AS a_cnt, COUNT({cnt_col}) AS a_matched"
            f" FROM {from_sql} GROUP BY {gk}"
        )
    # group by a NULLABLE right-side key: both engines must bucket the
    # null-extended rows into one NULL group
    gk = rng.choice(GROUP_KEYS[right])
    return f"SELECT {gk}, COUNT(*) AS a_cnt FROM {from_sql} GROUP BY {gk}"


def _gen_setop(rng: random.Random, pools: dict) -> str:
    """UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL] of two (sometimes
    three) predicate-disjoint-or-overlapping branches over one table —
    identical projections so the branch schemas line up, different WHERE
    literals so the multiset algebra actually has work to do."""
    tbl = rng.choice(list(SCHEMA))
    proj = rng.sample(list(SCHEMA[tbl]), rng.randrange(1, 3))
    sel = ", ".join(proj)

    def branch() -> str:
        col, kind = rng.choice(list(SCHEMA[tbl].items()))
        return f"SELECT {sel} FROM {tbl} WHERE {_predicate(rng, col, kind, pools)}"

    op = rng.choice(
        ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL", "EXCEPT", "EXCEPT ALL"]
    )
    sql = f"{branch()} {op} {branch()}"
    if rng.random() < 0.25:
        op2 = rng.choice(["UNION", "UNION ALL"])
        sql = f"{sql} {op2} {branch()}"
    return sql


def _gen_qualify(rng: random.Random, pools: dict) -> str:
    """QUALIFY queries — exercised through the CLIENT's SQL-text rewrite
    (timetravel_sql.rewrite_qualify) on the Spark side vs DuckDB's NATIVE
    QUALIFY, so the rewrite itself is the system under test: bare window
    predicates, select-list alias references, and per-branch QUALIFY in a
    set operation."""
    tbl = rng.choice(list(PK))
    pk, gk = PK[tbl], rng.choice(GROUP_KEYS[tbl])
    n = rng.randrange(1, 4)
    col, kind = rng.choice(list(SCHEMA[tbl].items()))
    where = f" WHERE {_predicate(rng, col, kind, pools)}" if rng.random() < 0.5 else ""
    rn = f"ROW_NUMBER() OVER (PARTITION BY {gk} ORDER BY {pk})"
    mode = rng.randrange(4)
    if mode == 0:  # bare window predicate
        return f"SELECT {pk}, {gk} FROM {tbl}{where} QUALIFY {rn} <= {n}"
    if mode == 1:  # predicate over a select-list alias
        return f"SELECT {pk}, {gk}, {rn} AS rn FROM {tbl}{where} QUALIFY rn <= {n}"
    if mode == 2:  # the rewriter's tail split: ORDER BY/LIMIT after the
        # predicate (deterministic: total order on the unique PK)
        lim = rng.choice([10, 50])
        return (
            f"SELECT {pk}, {gk} FROM {tbl}{where} QUALIFY {rn} <= {n}"
            f" ORDER BY {pk} LIMIT {lim}"
        )
    # per-branch QUALIFY inside a set operation (one QUALIFY per branch)
    b2 = f"SELECT {pk}, {gk} FROM {tbl} QUALIFY {rn} = 1"
    return f"SELECT {pk}, {gk} FROM {tbl}{where} QUALIFY {rn} <= {n} UNION ALL {b2}"


def _gen_grouping_sets(rng: random.Random, pools: dict) -> str:
    """ROLLUP / CUBE / GROUPING SETS with GROUPING() flags — the
    super-aggregate NULL rows and their disambiguation flags must agree
    across engines (both distinguish 'NULL because super-aggregate' from
    'NULL data key' via GROUPING()).

    KNOWN DIVERGENCE, excluded by construction: over an EMPTY input
    relation, the standard (and DuckDB/Postgres) emit one grand-total
    row for the ``()`` grouping set, but Spark emits ZERO rows —
    this round's fuzz sweep found it via ``WHERE o_orderdate <
    TIMESTAMP '<min>' GROUP BY CUBE(...)`` (seed 424311 #209; pinned in
    tests/test_differential.py::test_known_divergence_empty_cube). The
    WHERE here therefore only uses predicates that CANNOT empty the
    relation: equality/IN on a string value sampled from the data."""
    tbl = rng.choice([t for t in SCHEMA if len(GROUP_KEYS[t]) >= 2])
    k1, k2 = rng.sample(GROUP_KEYS[tbl], 2)
    spec = rng.choice(
        [
            f"ROLLUP({k1}, {k2})",
            f"CUBE({k1}, {k2})",
            f"GROUPING SETS (({k1}), ({k1}, {k2}), ())",
        ]
    )
    agg, alias = _aggregate(rng, SCHEMA[tbl])
    where = ""
    if rng.random() < 0.4:
        strs = [c for c, k in SCHEMA[tbl].items() if k == "str"]
        if strs:
            col = rng.choice(strs)
            vals = pools[col]
            if rng.random() < 0.5:
                where = f" WHERE {col} = {_sql_str(rng.choice(vals))}"
            else:
                pick = rng.sample(vals, min(len(vals), rng.randrange(1, 4)))
                where = f" WHERE {col} IN ({', '.join(_sql_str(v) for v in pick)})"
    return (
        f"SELECT {k1}, {k2}, CAST(GROUPING({k1}) AS INT) AS g1,"
        f" CAST(GROUPING({k2}) AS INT) AS g2, {agg} AS {alias}"
        f" FROM {tbl}{where} GROUP BY {spec}"
    )


def _gen_scalar_subquery(rng: random.Random, pools: dict) -> str:
    """Correlated scalar subquery in the SELECT list — COUNT(*) (never
    NULL) or MIN/MAX (NULL on empty match set) per outer row."""
    outer, inner, corr = rng.choice(EXISTS_LINKS)
    icol, ikind = rng.choice(
        [(c, k) for c, k in SCHEMA[inner].items() if k in ("int", "double")]
    )
    ip = ""
    if rng.random() < 0.5:
        ip = f" AND {_predicate(rng, icol, ikind, pools)}"
    fn = rng.choice(["COUNT(*)", f"MIN({icol})", f"MAX({icol})"])
    sub = f"(SELECT {fn} FROM {inner} WHERE {corr}{ip}) AS sub_v"
    col, kind = rng.choice(list(SCHEMA[outer].items()))
    where = f" WHERE {_predicate(rng, col, kind, pools)}" if rng.random() < 0.5 else ""
    return f"SELECT {PK[outer]}, {sub} FROM {outer}{where}"


def _gen_window_frames(rng: random.Random, pools: dict) -> str:
    """Window frames and navigation functions — LAG/LEAD with defaults,
    FIRST_VALUE/LAST_VALUE under explicit ROWS frames, bounded moving
    windows. Deterministic by construction: every OVER orders by the
    table's unique PK (total order), so frame contents are identical on
    both engines. Doubles route through the DECIMAL-sum convention."""
    tbl = rng.choice(list(PK))
    pk, gk = PK[tbl], rng.choice(GROUP_KEYS[tbl])
    col, kind = rng.choice(
        [(c, k) for c, k in SCHEMA[tbl].items() if k in ("int", "double")]
    )
    val = col if kind == "int" else f"CAST({col} AS DECIMAL(18,2))"
    over = f"OVER (PARTITION BY {gk} ORDER BY {pk}"
    k = rng.randrange(1, 4)
    fns = [
        f"LAG({col}, {k}) {over})",
        f"LEAD({col}, {k}) {over})",
        f"LAG({col}, {k}, {'-1' if kind == 'int' else '-1.0'}) {over})",
        f"FIRST_VALUE({col}) {over} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
        f"LAST_VALUE({col}) {over} ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)",
        f"CAST(SUM({val}) {over} ROWS BETWEEN {k} PRECEDING AND CURRENT ROW) AS DOUBLE)",
        f"MIN({col}) {over} ROWS BETWEEN {k} PRECEDING AND {k} FOLLOWING)",
        f"COUNT(*) {over} ROWS BETWEEN UNBOUNDED PRECEDING AND {k} FOLLOWING)",
    ]
    fcol, fkind = rng.choice(list(SCHEMA[tbl].items()))
    where = (
        f" WHERE {_predicate(rng, fcol, fkind, pools)}" if rng.random() < 0.5 else ""
    )
    picks = rng.sample(fns, rng.randrange(1, 3))
    sel = ", ".join(f"{f} AS w{i}" for i, f in enumerate(picks))
    return f"SELECT {pk}, {gk}, {sel} FROM {tbl}{where}"


def _gen_conditional_agg(rng: random.Random, pools: dict) -> str:
    """Conditional aggregation — CASE-in-SUM pivot columns and the
    standard FILTER (WHERE ...) clause, the two idioms every reporting
    query uses; both engines implement both, and the NULL-vs-0 behavior
    of each (CASE ELSE 0 vs FILTER's empty-set NULL→COUNT 0) must agree."""
    tbl = rng.choice(list(SCHEMA))
    gk = rng.choice(GROUP_KEYS[tbl])
    col, kind = rng.choice(
        [(c, k) for c, k in SCHEMA[tbl].items() if k in ("int", "double")]
    )
    pcol, pkind = rng.choice(list(SCHEMA[tbl].items()))
    pred = _predicate(rng, pcol, pkind, pools)
    val = col if kind == "int" else f"CAST({col} AS DECIMAL(18,2))"
    wrap = (lambda e: e) if kind == "int" else (lambda e: f"CAST({e} AS DOUBLE)")
    aggs = [
        (f"SUM(CASE WHEN {pred} THEN {val} ELSE 0 END)", "a_case_sum", True),
        (f"COUNT(CASE WHEN {pred} THEN 1 END)", "a_case_cnt", False),
        (f"SUM({val}) FILTER (WHERE {pred})", "a_filter_sum", True),
        (f"COUNT(*) FILTER (WHERE {pred})", "a_filter_cnt", False),
        (f"MIN({col}) FILTER (WHERE {pred})", "a_filter_min", False),
    ]
    picks = rng.sample(aggs, rng.randrange(2, 4))
    sel = ", ".join(
        f"{wrap(e) if is_sum else e} AS {a}" for e, a, is_sum in picks
    )
    return f"SELECT {gk}, COUNT(*) AS a_cnt, {sel} FROM {tbl} GROUP BY {gk}"


def _gen_nested_agg(rng: random.Random, pools: dict) -> str:
    """Aggregate over a derived-table aggregate — the re-aggregation
    shape (per-key rollup, then stats over the rollup) that exercises
    nested GROUP BY planning and the DECIMAL boundary twice."""
    left, right, cond = rng.choice(JOINS)
    if rng.random() < 0.5:
        from_sql = f"{left} JOIN {right} ON {cond}"
        cols = {**SCHEMA[left], **SCHEMA[right]}
        inner_key = rng.choice(GROUP_KEYS[left])
    else:
        src = rng.choice([left, right])
        from_sql = src
        cols = SCHEMA[src]
        inner_key = rng.choice(GROUP_KEYS[src])
    col, kind = rng.choice(
        [(c, k) for c, k in cols.items() if k in ("int", "double")]
    )
    inner_agg = (
        f"SUM({col})" if kind == "int"
        else f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE)"
    )
    fcol, fkind = rng.choice(list(cols.items()))
    where = (
        f" WHERE {_predicate(rng, fcol, fkind, pools)}" if rng.random() < 0.5 else ""
    )
    inner = (
        f"SELECT {inner_key} AS k, {inner_agg} AS v, COUNT(*) AS c"
        f" FROM {from_sql}{where} GROUP BY {inner_key}"
    )
    outer = rng.choice(
        [
            "SELECT COUNT(*) AS n_groups, MIN(v) AS a_min, MAX(v) AS a_max,"
            " SUM(c) AS a_rows",
            "SELECT COUNT(*) AS n_groups, SUM(c) AS a_rows",
            "SELECT k, v, c",  # pass-through: derived table as a relation
        ]
    )
    return f"{outer} FROM ({inner}) t"


def _gen_in_subquery(rng: random.Random, pools: dict) -> str:
    """Uncorrelated IN / NOT IN subqueries on the FK links. The inner
    side projects a KEY column (non-null by construction in this data),
    so NOT IN's NULL-poisoning rule never makes the comparison engine-
    ambiguous — what's under test is semi/anti planning and dedup of the
    inner relation, not three-valued logic."""
    outer, inner, corr = rng.choice(EXISTS_LINKS)
    # corr is "inner_col = outer_col"; IN flips it to column membership
    inner_col, outer_col = corr.split(" = ")
    icol, ikind = rng.choice(list(SCHEMA[inner].items()))
    ip = _predicate(rng, icol, ikind, pools)
    neg = "NOT " if rng.random() < 0.4 else ""
    sub = f"SELECT {inner_col} FROM {inner} WHERE {ip}"
    ocol, okind = rng.choice(list(SCHEMA[outer].items()))
    extra = (
        f" AND {_predicate(rng, ocol, okind, pools)}" if rng.random() < 0.4 else ""
    )
    proj = rng.sample(list(SCHEMA[outer]), rng.randrange(1, 3))
    if rng.random() < 0.5:
        return (
            f"SELECT {', '.join(proj)} FROM {outer}"
            f" WHERE {outer_col} {neg}IN ({sub}){extra}"
        )
    gk = rng.choice(GROUP_KEYS[outer])
    return (
        f"SELECT {gk}, COUNT(*) AS a_cnt FROM {outer}"
        f" WHERE {outer_col} {neg}IN ({sub}){extra} GROUP BY {gk}"
    )


# tables with a timestamp column the datetime shapes can bucket on
TS_COLS = [("orders", "o_orderdate"), ("lineitem", "l_shipdate")]


def _gen_datetime(rng: random.Random, pools: dict) -> str:
    """Date/time expression shapes (round 9): date_trunc buckets as
    GROUP BY keys, EXTRACT fields, and INTERVAL arithmetic in
    predicates — TPC-H's bread and butter. Dialect notes verified
    before wiring: DuckDB's date_trunc on TIMESTAMP returns DATE while
    Spark returns TIMESTAMP, so buckets are CAST AS TIMESTAMP on both;
    week truncation (ISO Monday) and month-end INTERVAL clamping
    (Jan 31 + 1 MONTH = Feb 28) were probed equal on both engines."""
    tbl, ts = rng.choice(TS_COLS)
    lo, hi = pools[ts]
    k = rng.randrange(1, 7)
    unit_iv = rng.choice(["MONTH", "DAY"])
    anchor = rng.choice(
        [
            f"{ts} >= TIMESTAMP '{lo}' + INTERVAL '{k}' {unit_iv}",
            f"{ts} < TIMESTAMP '{hi}' - INTERVAL '{k}' {unit_iv}",
        ]
    )
    mode = rng.randrange(3)
    if mode == 0:
        unit = rng.choice(["year", "quarter", "month", "week", "day"])
        bucket = f"CAST(date_trunc('{unit}', {ts}) AS TIMESTAMP)"
        agg_e, agg_a = _aggregate(rng, SCHEMA[tbl])
        return (
            f"SELECT {bucket} AS bucket, COUNT(*) AS a_cnt, {agg_e} AS {agg_a}"
            f" FROM {tbl} WHERE {anchor} GROUP BY {bucket}"
        )
    if mode == 1:
        fields = rng.sample(["YEAR", "MONTH", "DAY"], rng.randrange(1, 3))
        keys = [f"EXTRACT({f} FROM {ts})" for f in fields]
        sel = ", ".join(f"{k_} AS e_{f.lower()}" for k_, f in zip(keys, fields))
        fcol, fkind = rng.choice(list(SCHEMA[tbl].items()))
        where = (
            f" WHERE {_predicate(rng, fcol, fkind, pools)}"
            if rng.random() < 0.5
            else ""
        )
        return (
            f"SELECT {sel}, COUNT(*) AS a_cnt FROM {tbl}{where}"
            f" GROUP BY {', '.join(keys)}"
        )
    # mode 2: interval predicate only, plain aggregate — the pushdown shape
    agg_e, agg_a = _aggregate(rng, SCHEMA[tbl])
    gk = rng.choice(GROUP_KEYS[tbl])
    return (
        f"SELECT {gk}, {agg_e} AS {agg_a} FROM {tbl}"
        f" WHERE {anchor} GROUP BY {gk}"
    )


def _gen_null_logic(rng: random.Random, pools: dict) -> str:
    """Three-valued-logic shapes (round 9) over REAL null-extended rows:
    a LEFT JOIN whose ON clause filters the right side manufactures
    NULLs, then IS [NOT] DISTINCT FROM / NULLIF / COALESCE run over
    them — the null-semantics corners plain predicates never reach.
    IS DISTINCT FROM was probed supported+equal on both engines."""
    left, right, cond = rng.choice(JOINS)
    rcol, rkind = rng.choice(list(SCHEMA[right].items()))
    extra = _predicate(rng, rcol, rkind, pools)
    from_sql = f"{left} LEFT JOIN {right} ON {cond} AND {extra}"
    # ts columns stay out: CAST(TIMESTAMP AS DOUBLE) is a DuckDB error
    ncol, nkind = rng.choice(
        [(c, k) for c, k in SCHEMA[right].items() if k != "ts"]
    )
    mode = rng.randrange(3)
    if mode == 0:
        # IS [NOT] DISTINCT FROM a data-derived literal — unlike <> it is
        # TRUE/FALSE (never UNKNOWN) on the null-extended rows
        if nkind == "str":
            lit = _sql_str(rng.choice(pools[ncol]))
        else:
            lit = str(rng.choice(pools[ncol]))
        neg = "NOT " if rng.random() < 0.5 else ""
        gk = rng.choice(GROUP_KEYS[left])
        return (
            f"SELECT {gk}, COUNT(*) AS a_cnt FROM {from_sql}"
            f" WHERE {ncol} IS {neg}DISTINCT FROM {lit} GROUP BY {gk}"
        )
    if mode == 1:
        # COALESCE the null-extended group key to a sentinel; NULLIF makes
        # extra NULLs from matched rows equal to the pool literal
        if nkind == "str":
            sent, v = "'<missing>'", _sql_str(rng.choice(pools[ncol]))
            key = f"COALESCE(NULLIF({ncol}, {v}), {sent})"
        else:
            key = f"COALESCE(CAST({ncol} AS DOUBLE), -1.0)"
        return (
            f"SELECT {key} AS k, COUNT(*) AS a_cnt, COUNT({ncol}) AS a_matched"
            f" FROM {from_sql} GROUP BY {key}"
        )
    # mode 2: null-safe self-comparison between the two sides' columns —
    # grouped counts of the DISTINCT-FROM verdicts
    lcol = rng.choice([c for c, k in SCHEMA[left].items() if k == "str"])
    rstr = [c for c, k in SCHEMA[right].items() if k == "str"]
    if not rstr:
        rstr = list(SCHEMA[right])
    ncol2 = rng.choice(rstr)
    return (
        f"SELECT COUNT(*) AS a_cnt,"
        f" COUNT(*) FILTER (WHERE {lcol} IS DISTINCT FROM {ncol2}) AS a_diff,"
        f" COUNT(*) FILTER (WHERE {ncol2} IS NULL) AS a_null"
        f" FROM {from_sql}"
    )


def _gen_limit_offset(rng: random.Random, pools: dict) -> str:
    """Deterministic top-k paging (round 9): ORDER BY the unique PK
    (total order → the selected WINDOW is engine-independent even
    though canon compares as multisets) with LIMIT and OFFSET — the
    TakeOrderedAndProject / paging path the fixed registry pins but the
    fuzzer never composed with generated predicates."""
    tbl = rng.choice(list(PK))
    pk = PK[tbl]
    fcol, fkind = rng.choice(list(SCHEMA[tbl].items()))
    where = (
        f" WHERE {_predicate(rng, fcol, fkind, pools)}" if rng.random() < 0.6 else ""
    )
    proj = rng.sample(list(SCHEMA[tbl]), rng.randrange(1, 3))
    if pk not in proj:
        proj = [pk] + proj
    direction = rng.choice(["ASC", "DESC"])
    k = rng.randrange(1, 20)
    offset = f" OFFSET {rng.randrange(0, 15)}" if rng.random() < 0.5 else ""
    return (
        f"SELECT {', '.join(proj)} FROM {tbl}{where}"
        f" ORDER BY {pk} {direction} LIMIT {k}{offset}"
    )


def gen_query(rng: random.Random, pools: dict) -> str:
    shape = rng.random()
    if shape < 0.06:
        return _gen_datetime(rng, pools)
    if shape < 0.12:
        return _gen_null_logic(rng, pools)
    if shape < 0.16:
        return _gen_limit_offset(rng, pools)
    shape = (shape - 0.16) / 0.84  # renormalize the round-6/7 shapes below
    if shape < 0.08:
        return _gen_window_frames(rng, pools)
    if shape < 0.15:
        return _gen_conditional_agg(rng, pools)
    if shape < 0.21:
        return _gen_nested_agg(rng, pools)
    if shape < 0.27:
        return _gen_in_subquery(rng, pools)
    shape = (shape - 0.27) / 0.73  # renormalize the round-6 shapes below
    if shape < 0.10:
        return _gen_outer_join(rng, pools)
    if shape < 0.18:
        return _gen_setop(rng, pools)
    if shape < 0.26:
        return _gen_qualify(rng, pools)
    if shape < 0.32:
        return _gen_grouping_sets(rng, pools)
    if shape < 0.38:
        return _gen_scalar_subquery(rng, pools)
    tbl = None
    roll = rng.random()
    if roll < 0.30:
        left, right, cond = rng.choice(JOINS)
        from_sql = f"{left} JOIN {right} ON {cond}"
        cols = {**SCHEMA[left], **SCHEMA[right]}
        key_pool = GROUP_KEYS[left] + GROUP_KEYS[right]
    elif roll < 0.45:
        t1, t2, c12, t3, c23 = rng.choice(CHAINS)
        from_sql = f"{t1} JOIN {t2} ON {c12} JOIN {t3} ON {c23}"
        cols = {**SCHEMA[t1], **SCHEMA[t2], **SCHEMA[t3]}
        key_pool = GROUP_KEYS[t1] + GROUP_KEYS[t2] + GROUP_KEYS[t3]
    else:
        tbl = rng.choice(list(SCHEMA))
        from_sql = tbl
        cols = SCHEMA[tbl]
        key_pool = GROUP_KEYS[tbl]
    preds = [
        _predicate(rng, c, cols[c], pools)
        for c in rng.sample(list(cols), rng.randrange(0, 3))
    ]
    if len(preds) == 2 and rng.random() < 0.3:
        preds = [f"({preds[0]} OR {preds[1]})"]
    if tbl is not None and rng.random() < 0.2:
        links = [x for x in EXISTS_LINKS if x[0] == tbl]
        if links:
            _, inner, corr = rng.choice(links)
            ip = _predicate(
                rng, *rng.choice(list(SCHEMA[inner].items())), pools
            )
            neg = "NOT " if rng.random() < 0.3 else ""
            preds.append(
                f"{neg}EXISTS (SELECT 1 FROM {inner} WHERE {corr} AND {ip})"
            )
    where = f" WHERE {' AND '.join(preds)}" if preds else ""

    if tbl is not None and tbl in PK and rng.random() < 0.15:
        # deterministic window query: partition by a group key, order by
        # the unique PK (total order -> engine-independent numbering)
        gk = rng.choice(GROUP_KEYS[tbl])
        fn = rng.choice(
            [f"ROW_NUMBER() OVER (PARTITION BY {gk} ORDER BY {PK[tbl]})",
             f"COUNT(*) OVER (PARTITION BY {gk})",
             f"SUM(1) OVER (PARTITION BY {gk} ORDER BY {PK[tbl]} ROWS UNBOUNDED PRECEDING)"]
        )
        return f"SELECT {PK[tbl]}, {gk}, {fn} AS w FROM {tbl}{where}"

    if rng.random() < 0.5:  # grouped aggregate
        keys = rng.sample(key_pool, rng.randrange(1, min(2, len(key_pool)) + 1))
        aggs = [_aggregate(rng, cols) for _ in range(rng.randrange(1, 3))]
        sel = ", ".join(keys + [f"{e} AS {a}" for e, a in aggs])
        having = ""
        if rng.random() < 0.3:
            nums = [(c, k) for c, k in cols.items() if k in ("int", "double")]
            hcol, _ = rng.choice(nums)
            hv = rng.choice(pools[hcol])
            having = " HAVING " + rng.choice(
                [
                    f"COUNT(*) > {rng.randrange(1, 4)}",
                    f"MIN({hcol}) > {hv}",
                    f"MAX({hcol}) < {hv}",
                    f"COUNT(*) > {rng.randrange(1, 4)} AND MIN({hcol}) <= {hv}",
                ]
            )
        return f"SELECT {sel} FROM {from_sql}{where} GROUP BY {', '.join(keys)}{having}"

    # plain (optionally DISTINCT) projection
    proj = rng.sample(list(cols), rng.randrange(1, min(3, len(cols)) + 1))
    sel = list(proj)
    if rng.random() < 0.4:
        e, a = _scalar_expr(rng, cols, pools)
        sel.append(f"{e} AS {a}")
    distinct = "DISTINCT " if rng.random() < 0.25 else ""
    return f"SELECT {distinct}{', '.join(sel)} FROM {from_sql}{where}"


def main(n: int, seed: int) -> int:
    spark = get_spark(app_name="fuzz-differential", shuffle_partitions=8)
    con = duckdb.connect()
    for t in SCHEMA:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        spark.read.parquet(path).createOrReplaceTempView(t)
    pools = _sample_pools(con)
    rng = random.Random(seed)
    failures = 0
    t0 = time.time()
    for i in range(n):
        sql = gen_query(rng, pools)
        try:
            # QUALIFY goes through the client's SQL-text rewrite on the
            # Spark side (Spark has no native QUALIFY); DuckDB runs it
            # natively — the rewrite IS the system under test here.
            spark_sql = rewrite_qualify(sql) if "QUALIFY" in sql else sql
            sdf = spark.sql(spark_sql)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
            rel = con.sql(sql)
            d_cols = [c.lower() for c in rel.columns]
            d_rows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"FAIL #{i}: engine error: {exc}\n  SQL: {sql}")
            continue
        if canon_rows(s_cols, s_rows) != canon_rows(d_cols, d_rows):
            failures += 1
            print(
                f"FAIL #{i}: mismatch spark={len(s_rows)} duck={len(d_rows)} rows"
                f"\n  SQL: {sql}"
            )
    ok = n - failures
    print(f"\n{ok}/{n} queries agree (seed={seed}, {time.time()-t0:.1f}s, {SF_DIR})")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    raise SystemExit(main(N, SEED))
