#!/usr/bin/env python
"""Differential fuzzing of the time-travel SQL rewrite surface
(timetravel_sql.rewrite_time_travel — the remaining hand-parsed SQL path
after round 7's DML fuzzer campaign).

Each case builds a fresh snapshot-table history (4–6 main commits with a
random overwrite, a staging branch with an unpublished commit, a tag),
then generates queries that exercise every rewrite feature:

- ``FOR TIMESTAMP AS OF`` / ``TIMESTAMP AS OF`` (both dialects, with and
  without the inner TIMESTAMP keyword) at timestamps that straddle
  snapshot boundaries: exactly AT a commit, 1µs before/after one,
  midpoints, before-first (must error on BOTH sides), far future;
- ``FOR VERSION AS OF <id>`` / ``VERSION AS OF <id>`` over every
  snapshot id including the unpublished branch commit (id-addressed
  reads see branch commits; timestamp travel must NOT), plus invalid
  ids (both sides must refuse);
- ``VERSION AS OF '<ref>'`` over branch heads, tags, ``main``, and
  unknown refs (both sides must refuse);
- bare registered-name references (rewritten to a current-snapshot
  view), travel+current self-joins, dimension joins, TWO independent
  travel clauses in one statement (scalar subqueries), metadata
  relations (``$snapshots/$files/$history/$refs/$partitions/
  $properties/$manifests``), and string-literal
  decoys that contain travel syntax and must come through VERBATIM.

The twin is the same query template with each travel reference replaced
at GENERATION time by a temp view created through the direct API
(``read_as_of`` / ``read_version`` / ``read_ref`` / ``read`` — the
snapshot engine pytest already pins), run through ``spark.sql`` with no
rewriting. Row sets must match exactly; error cases must raise on both
sides. Divergence therefore isolates the REWRITER: clause detection,
literal spans, span-overlap priority, splicing.

Usage:
    python tools/fuzz_timetravel.py            # 50 cases x ~10 queries, seed 0
    python tools/fuzz_timetravel.py 70 7       # 70 cases, seed 7

Exit 1 on any divergence; each failure prints the query for replay.
"""

from __future__ import annotations

import datetime as dt
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trino_iceberg_spark.catalog.snapshots import SnapshotTable  # noqa: E402
from trino_iceberg_spark.client import AthenaSparkClient  # noqa: E402
from trino_iceberg_spark.errors import EngineError, QueryError  # noqa: E402
from trino_iceberg_spark.session import get_spark  # noqa: E402

SCHEMA = "id long, grp string, val long"
GROUPS = ["gA", "gB", "gC"]


class _History:
    """One table history + the ground truth needed to build twins."""

    def __init__(self, spark, rng: random.Random, workdir: str, case_no: int):
        self.spark = spark
        tdir = os.path.join(workdir, f"tt_{case_no}")
        self.table = SnapshotTable(spark, tdir)
        next_id = 0
        n_commits = rng.randrange(4, 7)
        for c in range(n_commits):
            rows = [
                (next_id + j, rng.choice(GROUPS), rng.randrange(0, 100))
                for j in range(rng.randrange(2, 5))
            ]
            next_id += len(rows)
            df = spark.createDataFrame(rows, SCHEMA)
            if c > 0 and rng.random() < 0.2:
                self.table.overwrite(df)
            else:
                self.table.append(df)
        self.snaps = self.table.snapshots()  # oldest..newest, main only so far
        self.table.create_branch("aud", from_snapshot_id=self.snaps[1].snapshot_id)
        self.table.create_tag("rel", snapshot_id=self.snaps[2].snapshot_id)
        # unpublished branch commit — visible to VERSION/ref reads only
        self.table.append(
            spark.createDataFrame([(9000, "gZ", 1)], SCHEMA), branch="aud"
        )
        self.branch_head_id = [
            s.snapshot_id
            for s in self.table.snapshots()
            if s.snapshot_id not in {x.snapshot_id for x in self.snaps}
        ][0]
        # dimension table for joins
        ddir = os.path.join(workdir, f"dim_{case_no}")
        self.dim = SnapshotTable(spark, ddir)
        self.dim.append(
            spark.createDataFrame(
                [(g, f"name_{g}") for g in GROUPS], "grp string, name string"
            )
        )
        self.client = AthenaSparkClient(spark)
        self.client.register_snapshot_table("fz_tt", tdir)
        self.client.register_snapshot_table("fz_dim", ddir)
        self._twin_n = 0

    # -- travel specs ----------------------------------------------------

    def _ts_literal(self, ts: dt.datetime) -> str:
        return ts.astimezone(dt.timezone.utc).strftime("%Y-%m-%d %H:%M:%S.%f")

    def gen_spec(self, rng: random.Random) -> dict:
        """One travel spec: the SQL clause text + a twin-view factory +
        whether both sides must refuse."""
        kind = rng.choices(
            ["ts", "ver", "ref", "bad_ts", "bad_ver", "bad_ref"],
            weights=[40, 25, 20, 5, 5, 5],
        )[0]
        for_kw = rng.random() < 0.6
        prefix = "FOR " if for_kw else ""
        if kind in ("ts", "bad_ts"):
            if kind == "bad_ts":  # strictly before the first commit
                ts = self.snaps[0].committed_at - dt.timedelta(seconds=30)
            else:
                anchor = rng.choice(self.snaps)
                mode = rng.choice(["at", "just_before", "just_after", "mid", "future"])
                if mode == "at":
                    ts = anchor.committed_at
                elif mode == "just_before":
                    ts = anchor.committed_at - dt.timedelta(microseconds=1)
                elif mode == "just_after":
                    ts = anchor.committed_at + dt.timedelta(microseconds=1)
                elif mode == "future":
                    ts = self.snaps[-1].committed_at + dt.timedelta(days=400)
                else:
                    i = rng.randrange(len(self.snaps) - 1)
                    a = self.snaps[i].committed_at_us
                    b = self.snaps[i + 1].committed_at_us
                    ts = dt.datetime.fromtimestamp(
                        ((a + b) // 2) / 1e6, dt.timezone.utc
                    )
                if ts < self.snaps[0].committed_at:
                    kind = "bad_ts"  # 1µs before the first commit
            inner = "TIMESTAMP " if rng.random() < 0.5 else ""
            clause = f"{prefix}TIMESTAMP AS OF {inner}'{self._ts_literal(ts)}'"
            return {
                "clause": clause,
                "twin": lambda t=ts: self.table.read_as_of(t),
                "error": kind == "bad_ts",
            }
        if kind in ("ver", "bad_ver"):
            if kind == "ver":
                vid = rng.choice(
                    [s.snapshot_id for s in self.snaps] + [self.branch_head_id]
                )
            else:
                vid = 999_999_999
            clause = f"{prefix}VERSION AS OF {vid}"
            return {
                "clause": clause,
                "twin": lambda v=vid: self.table.read_version(v),
                "error": kind == "bad_ver",
            }
        ref = rng.choice(["aud", "rel", "main"]) if kind == "ref" else "no_such_ref"
        clause = f"{prefix}VERSION AS OF '{ref}'"
        return {
            "clause": clause,
            "twin": lambda r=ref: self.table.read_ref(r),
            "error": kind == "bad_ref",
        }

    def twin_view(self, factory) -> str:
        self._twin_n += 1
        name = f"__twin_{self._twin_n}"
        factory().createOrReplaceTempView(name)
        return name


# -- query templates ---------------------------------------------------------
# {T}/{T2} = travel reference, {C} = bare current table, {D} = dim table.


def gen_query(rng: random.Random) -> tuple[str, int]:
    """Returns (template, n_travel_refs)."""
    op = rng.choice(["<", ">", "<=", ">="])
    k = rng.randrange(10, 90)
    g = rng.choice(GROUPS)
    meta = rng.choice(
        ["snapshots", "files", "history", "refs", "partitions",
         "properties", "manifests"]
    )
    decoy = "see fz_tt FOR TIMESTAMP AS OF TIMESTAMP ''2024-01-01'' ok"
    templates = [
        ("SELECT count(*) AS n, sum(val) AS s FROM {T}", 1),
        (
            f"SELECT grp, count(*) AS n FROM {{T}} WHERE val {op} {k} "
            "GROUP BY grp ORDER BY grp",
            1,
        ),
        (f"SELECT id, val FROM {{T}} WHERE grp = '{g}' ORDER BY id", 1),
        (
            "SELECT h.id, h.val AS hv, c.val AS cv FROM {T} h "
            "JOIN {C} c ON h.id = c.id ORDER BY h.id",
            1,
        ),
        (
            "SELECT d.name, count(*) AS n FROM {T} h JOIN {D} d "
            "ON h.grp = d.grp GROUP BY d.name ORDER BY d.name",
            1,
        ),
        (
            "SELECT (SELECT count(*) FROM {T}) AS a, "
            "(SELECT count(*) FROM {T2}) AS b",
            2,
        ),
        (
            "SELECT 'x' AS tag, count(*) AS n FROM {T} UNION ALL "
            "SELECT 'y' AS tag, count(*) AS n FROM {T2} ORDER BY tag",
            2,
        ),
        (f"SELECT count(*) AS n FROM fz_tt${meta}", 0),
        (f"SELECT '{decoy}' AS s, count(*) AS n FROM {{T}}", 1),
        ("SELECT count(*) AS n FROM {C} WHERE val >= 0", 0),
    ]
    return rng.choice(templates)


def run_case(spark, case_no: int, seed: int, workdir: str, n_queries: int = 10):
    """Returns a list of divergence descriptions (empty = agree)."""
    rng = random.Random(seed * 7_000_003 + case_no)
    h = _History(spark, rng, workdir, case_no)
    problems: list[str] = []
    for _ in range(n_queries):
        template, n_refs = gen_query(rng)
        specs = [h.gen_spec(rng) for _ in range(n_refs)]
        subs = {"C": "fz_tt", "D": "fz_dim"}
        twin_subs = {
            "C": h.twin_view(h.table.read),
            "D": h.twin_view(h.dim.read),
        }
        expect_error = any(s["error"] for s in specs)
        for i, s in enumerate(specs):
            key = "T" if i == 0 else "T2"
            subs[key] = f"fz_tt {s['clause']}"
            if not expect_error:
                twin_subs[key] = h.twin_view(s["twin"])
        sql = template.format(**{k: subs.get(k, "") for k in ("T", "T2", "C", "D")})
        # Spark-through-rewriter side
        try:
            got = sorted(tuple(r) for r in h.client.query(sql))
            spark_err = None
        except (QueryError, EngineError) as exc:
            got, spark_err = None, exc
        if expect_error:
            if spark_err is None:
                problems.append(f"expected refusal, got rows: {sql}")
            continue
        if spark_err is not None:
            problems.append(f"unexpected error {spark_err!r}: {sql}")
            continue
        # Twin side: direct API views, no rewriting
        twin_sql = template.format(
            **{k: twin_subs.get(k, "") for k in ("T", "T2", "C", "D")}
        )
        if "$" in twin_sql:  # metadata relation: twin reads the same manifests
            meta_kind = twin_sql.split("$", 1)[1].split(" ", 1)[0].split()[0]
            meta_df = {
                "snapshots": h.table.snapshots_df,
                "files": h.table.files_df,
                "history": h.table.history_df,
                "refs": h.table.refs_df,
                "partitions": h.table.partitions_df,
                "properties": h.table.properties_df,
                "manifests": h.table.manifests_df,
            }[meta_kind]()
            v = h.twin_view(lambda: meta_df)
            twin_sql = twin_sql.replace(f"fz_tt${meta_kind}", v)
        want = sorted(tuple(r) for r in spark.sql(twin_sql).collect())
        if got != want:
            problems.append(
                f"row divergence:\n  sql:  {sql}\n  twin: {twin_sql}\n"
                f"  got {got[:5]}... want {want[:5]}..."
            )
    return problems


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    spark = get_spark(app_name="fuzz_timetravel", master="local[8]", shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="fuzz_tt_")
    t0 = time.time()
    failures = 0
    try:
        for i in range(n):
            problems = run_case(spark, i, seed, workdir)
            if problems:
                failures += 1
                print(f"FAIL case {i}:")
                for p in problems:
                    print("  " + p)
            if (i + 1) % 10 == 0:
                print(
                    f"  ...{i + 1}/{n} cases, {failures} failures, "
                    f"{time.time() - t0:.0f}s",
                    flush=True,
                )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    print(
        f"fuzz_timetravel: {n} cases (~{n * 10} queries), seed {seed}: "
        f"{n - failures} agree, {failures} diverge ({time.time() - t0:.0f}s)"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
