"""Property-based tests (hypothesis) for the SQL formatting layer.

The injection-safety and script-splitting invariants hold for ALL inputs,
not just the goldens — exactly the surface where a missed edge case
becomes a correctness (or security) bug. Spark round-trips run only for a
small deterministic sample; the pure-string properties run for hundreds
of generated cases."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from trino_iceberg_spark.formatting import format_sql, render_literal, split_statements

text_values = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
)


@given(text_values)
@settings(max_examples=300, deadline=None)
def test_string_literal_quotes_balanced(s):
    lit = render_literal(s)
    assert lit.startswith("'") and lit.endswith("'")
    # Interior quotes are all doubled: stripping the outer pair and
    # collapsing '' must leave no bare quote.
    assert "'" not in lit[1:-1].replace("''", "")


@given(text_values)
@settings(max_examples=300, deadline=None)
def test_format_sql_embeds_escaped_value(s):
    sql = format_sql("SELECT {0} AS v", s)
    assert sql == "SELECT " + render_literal(s) + " AS v"


@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=8))
@settings(max_examples=100, deadline=None)
def test_int_list_renders_parenthesized(xs):
    lit = render_literal(xs)
    assert lit.startswith("(") and lit.endswith(")")
    inner = lit[1:-1]
    if xs:
        assert [int(p) for p in inner.split(",")] == xs


@given(
    st.datetimes(
        min_value=dt.datetime(1900, 1, 1), max_value=dt.datetime(2100, 1, 1)
    )
)
@settings(max_examples=100, deadline=None)
def test_timestamp_lookbehind_never_doubles_keyword(ts):
    rendered = format_sql("SELECT TIMESTAMP {0} AS t", ts)
    assert rendered.upper().count("TIMESTAMP") == 1
    rendered_bare = format_sql("SELECT {0} AS t", ts)
    assert rendered_bare.upper().count("TIMESTAMP") == 1  # added by renderer


@given(st.lists(st.sampled_from(
    [
        "SELECT 1",
        "SELECT 'a;b'",
        "SELECT \"c;d\"",
        "INSERT INTO t VALUES ('it''s;fine')",
        "SELECT 1 -- trailing; comment",
        "SELECT /* block; comment */ 2",
    ]
), min_size=1, max_size=6))
@settings(max_examples=200, deadline=None)
def test_split_statements_roundtrip(stmts):
    # Separator on its own line: a ';' on the same line as a trailing
    # '--' comment is part of the comment (correct SQL), not a separator.
    script = "\n;\n".join(stmts) + "\n;"
    out = split_statements(script)
    assert len(out) == len(stmts)
    for orig, got in zip(stmts, out):
        assert got.strip() == orig.strip()


@pytest.mark.parametrize(
    "value",
    ["it's", 'say "hi"', "'; DROP TABLE t; --", "\\' OR 1=1 --", "a\nb"],
)
def test_injection_attempts_round_trip_through_spark(spark, value):
    """The rendered literal must come back from Spark byte-identical —
    the end-to-end proof that escaping is sufficient, not just plausible."""
    row = spark.sql(format_sql("SELECT {0} AS v", value)).first()
    assert row["v"] == value


# ---------------------------------------------------------------------------
# Row→dataclass binding properties (A6)
# ---------------------------------------------------------------------------

import dataclasses

from trino_iceberg_spark.mapping import bind_row


@st.composite
def _identifiers(draw):
    import keyword

    first = draw(st.sampled_from("abcdefghijklmnopqrstuvwxyz"))
    rest = draw(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789_", max_size=10))
    name = first + rest
    # make_dataclass rejects Python keywords as field names
    return name + "_" if keyword.iskeyword(name) else name


@given(
    _identifiers(),
    st.one_of(st.integers(-(2**31), 2**31), st.text(max_size=20), st.none()),
)
@settings(max_examples=200, deadline=None)
def test_bind_row_case_insensitive(name, value):
    cls = dataclasses.make_dataclass("Dto", [(name, object, dataclasses.field(default=None))])
    bound = bind_row(cls, {name.upper(): value})
    assert getattr(bound, name) == value


def test_bind_row_snake_vs_flat():
    @dataclasses.dataclass
    class Dto:
        user_name: str = ""

    assert bind_row(Dto, {"user_name": "x"}).user_name == "x"
    assert bind_row(Dto, {"USER_NAME": "y"}).user_name == "y"
    assert bind_row(Dto, {"username": "z"}).user_name == "z"  # underscore-insensitive


# ---------------------------------------------------------------------------
# Round-2 regression tests (ADVICE fixes)
# ---------------------------------------------------------------------------

import datetime as _dt
import typing as _t

from trino_iceberg_spark.formatting import render_literal, split_statements


def test_bind_row_missing_optional_without_default_binds_none():
    @dataclasses.dataclass
    class Dto:
        id: int
        note: _t.Optional[str]  # no default — must still bind None when absent

    bound = bind_row(Dto, {"id": 7})
    assert bound.id == 7
    assert bound.note is None


def test_render_literal_aware_datetime_converts_to_utc():
    tz = _dt.timezone(_dt.timedelta(hours=5, minutes=30))
    aware = _dt.datetime(2024, 3, 1, 10, 0, 0, tzinfo=tz)
    # 10:00+05:30 == 04:30 UTC; session timezone is pinned UTC
    assert render_literal(aware) == "TIMESTAMP '2024-03-01 04:30:00.000000'"
    naive = _dt.datetime(2024, 3, 1, 10, 0, 0)
    assert render_literal(naive) == "TIMESTAMP '2024-03-01 10:00:00.000000'"


def test_split_statements_backslash_escaped_quote():
    # escapedStringLiterals=false → backslash escapes the quote; the ';'
    # after \' is still inside the literal.
    script = r"SELECT 'a\'; b' AS x; SELECT 2"
    stmts = split_statements(script)
    assert stmts == [r"SELECT 'a\'; b' AS x", "SELECT 2"]


def test_split_statements_trailing_backslash_pair():
    # '\\' is a complete literal backslash — the following ; terminates.
    script = r"SELECT 'a\\'; SELECT 2"
    assert split_statements(script) == [r"SELECT 'a\\'", "SELECT 2"]


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcxyz_", min_size=1, max_size=8),
            st.sampled_from(
                [
                    "f(x, y)",
                    "'v,w'",
                    "1 + 2",
                    "concat(a, ',', b)",
                    "CASE WHEN x IN (1, 2) THEN 'a,b' ELSE c END",
                    "arr[1]",
                ]
            ),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_split_top_level_commas_recovers_assignments(pairs):
    """Commas inside quotes, parens, and brackets never split; every
    top-level assignment comes back exactly."""
    from trino_iceberg_spark.formatting import split_top_level_commas

    clause = ", ".join(f"{col} = {expr}" for col, expr in pairs)
    parts = split_top_level_commas(clause)
    assert parts == [f"{col} = {expr}" for col, expr in pairs]


# -- QUALIFY rewrite properties ---------------------------------------------

ident = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,10}", fullmatch=True).filter(
    lambda s: s.upper() not in {"QUALIFY", "ORDER", "LIMIT", "OFFSET", "FROM", "BY"}
)


@given(ident, ident, text_values)
@settings(max_examples=200, deadline=None)
def test_qualify_inside_string_literal_never_rewrites(col, tbl, s):
    from trino_iceberg_spark.formatting import render_literal
    from trino_iceberg_spark.timetravel_sql import rewrite_qualify

    sql = f"SELECT {col}, {render_literal('QUALIFY ' + s)} AS t FROM {tbl}"
    assert rewrite_qualify(sql) == sql


@given(ident, ident, ident, st.integers(min_value=1, max_value=99))
@settings(max_examples=200, deadline=None)
def test_qualify_rewrite_shape_and_idempotence(col, tbl, part, k):
    from trino_iceberg_spark.timetravel_sql import rewrite_qualify

    pred = f"ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {col}) <= {k}"
    sql = f"SELECT {col}, {part} FROM {tbl} QUALIFY {pred} ORDER BY {col} LIMIT {k}"
    out = rewrite_qualify(sql)
    # the clause is consumed, the predicate and tail survive verbatim
    assert "QUALIFY" not in out.upper().replace("__Q_", "")
    assert pred in out
    assert out.rstrip().endswith(f"ORDER BY {col} LIMIT {k}")
    # no top-level QUALIFY remains -> a second pass is the identity
    assert rewrite_qualify(out) == out


@given(ident, ident)
@settings(max_examples=200, deadline=None)
def test_qualify_in_subquery_untouched(col, tbl):
    from trino_iceberg_spark.timetravel_sql import rewrite_qualify

    sql = f"SELECT * FROM (SELECT {col} FROM {tbl} QUALIFY rn = 1) z"
    assert rewrite_qualify(sql) == sql


setop = st.sampled_from(["UNION", "UNION ALL", "INTERSECT", "EXCEPT", "EXCEPT ALL"])


@given(ident, ident, ident, setop, st.integers(min_value=1, max_value=99))
@settings(max_examples=200, deadline=None)
def test_qualify_scopes_to_final_setop_branch(col, tbl, tbl2, op, k):
    """In a set-operation query, QUALIFY wraps ONLY the final SELECT
    branch: the first branch and the operator survive verbatim as a
    prefix, the predicate survives, and no QUALIFY remains."""
    from trino_iceberg_spark.timetravel_sql import rewrite_qualify

    first = f"SELECT {col} FROM {tbl}"
    pred = f"ROW_NUMBER() OVER (ORDER BY {col}) <= {k}"
    sql = f"{first} {op} SELECT {col} FROM {tbl2} QUALIFY {pred}"
    out = rewrite_qualify(sql)
    assert out.startswith(f"{first} {op} SELECT")
    assert pred in out
    assert "QUALIFY" not in out.upper().replace("__Q_", "")
    assert rewrite_qualify(out) == out


@given(ident, ident, ident, setop, st.integers(min_value=1, max_value=99))
@settings(max_examples=200, deadline=None)
def test_qualify_in_nonfinal_branch_keeps_following_branch(col, tbl, tbl2, op, k):
    """A QUALIFY before a top-level set operator must not swallow the
    following branch into its predicate — the branch survives as the
    tail, outside the wrap."""
    from trino_iceberg_spark.timetravel_sql import rewrite_qualify

    pred = f"ROW_NUMBER() OVER (ORDER BY {col}) <= {k}"
    tail = f"SELECT {col} FROM {tbl2}"
    sql = f"SELECT {col} FROM {tbl} QUALIFY {pred} {op} {tail}"
    out = rewrite_qualify(sql)
    assert out.rstrip().endswith(f"{op} {tail}")
    assert pred in out
    # the predicate region must not contain the set operator
    wrapped = out[: out.rindex(op)]
    assert pred in wrapped


# -- shared paren scanner ----------------------------------------------------


def test_find_closing_paren_quote_rules():
    """The MERGE source scan and the SET splitter must share one quote
    contract: doubled quotes, backslash-escaped quotes (Spark's default
    string parsing), and double-quoted identifiers all shield parens."""
    from trino_iceberg_spark.formatting import find_closing_paren

    s = "(SELECT 'a,b(' AS x) tail"
    assert s[find_closing_paren(s)] == ")" and find_closing_paren(s) == 19
    s = "(SELECT 'it''s(' )"
    assert find_closing_paren(s) == len(s) - 1
    # backslash-escaped quote: the ( inside the literal must not count
    s = "(SELECT 'p\\'q(' AS x) rest"
    assert find_closing_paren(s) == s.index(") rest")
    # double-quoted identifier containing )
    s = '(SELECT "we)ird" FROM t)'
    assert find_closing_paren(s) == len(s) - 1
    assert find_closing_paren("(never closed (") == -1
    assert find_closing_paren("no paren") == -1
    # open_idx anchors mid-string
    s = "USING (SELECT 1) tail"
    assert find_closing_paren(s, 6) == 15


@st.composite
def _paren_body(draw, depth=0):
    """Balanced SQL-ish fragment: identifiers, string literals stuffed
    with parens/doubled quotes/backslash escapes, nested paren groups."""
    base = [
        st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True),
        st.sampled_from(
            ["'a,b('", "'it''s)('", "'p\\'q('", "''", "'((('", '"we)ird"']
        ),
    ]
    nested = st.deferred(lambda: _paren_body(depth=depth + 1)).map(
        lambda b: f"({b})"
    )
    token = st.one_of(*base) if depth >= 2 else st.one_of(*base, nested)
    parts = draw(st.lists(token, min_size=1, max_size=4))
    return " ".join(parts)


@given(_paren_body(), st.sampled_from(["", " tail", ") s ON t.id = s.id"]))
def test_find_closing_paren_property(body, tail):
    """For any balanced body wrapped in parens, the scanner returns the
    wrapping close-paren — literals full of parens/escapes never fool it,
    and trailing text (even with stray parens) is never consumed."""
    from trino_iceberg_spark.formatting import find_closing_paren

    text = f"({body}){tail}"
    assert find_closing_paren(text) == len(body) + 1


# -- comment-awareness (round 8): the shared scanner contract says SQL
# comments are opaque — quotes, parens, commas and semicolons inside
# '-- ...' and '/* ... */' never affect split/depth state. Previously
# the comma splitter and paren scanner were comment-blind (ADVICE r7).


def test_split_top_level_commas_comment_blindness_fixed():
    from trino_iceberg_spark.formatting import split_top_level_commas

    # a comma inside a block comment must not split
    parts = split_top_level_commas("a = 1 /* x, y */, b = 2")
    assert len(parts) == 2 and parts[0] == "a = 1 /* x, y */" and parts[1] == "b = 2"
    # an unbalanced paren and a stray quote inside a comment must not
    # corrupt depth/quote state for the rest of the scan
    parts = split_top_level_commas("a = f(1, 2) /* ( ' */, b = 'x,y', c = 3")
    assert [p.split(" =")[0] for p in parts] == ["a", "b", "c"]
    # line comment swallows to end-of-line only
    parts = split_top_level_commas("a = 1 -- not, split ( '\n, b = 2")
    assert len(parts) == 2 and parts[1] == "b = 2"


def test_find_closing_paren_comment_blindness_fixed():
    from trino_iceberg_spark.formatting import find_closing_paren

    s = "(SELECT 1 /* ) ' ( */ + 2) tail"
    assert find_closing_paren(s) == s.index(") tail")
    s = "(SELECT 1 -- )\n + 2) tail"
    assert find_closing_paren(s) == s.index(") tail")
    # unclosed block comment never finds the paren
    assert find_closing_paren("(SELECT 1 /* )") == -1
    # '/*/' does NOT self-close (the opener's '*' is consumed) — all
    # three scanners agree on this
    assert find_closing_paren("(a /*/ )") == -1


def test_split_statements_opener_star_not_reused():
    from trino_iceberg_spark.formatting import split_statements

    # '/*/' leaves the comment open: the ';' is comment content
    stmts = split_statements("SELECT 1 /*/ ; still comment")
    assert len(stmts) == 1
    # a real close works and the ';' after it splits
    stmts = split_statements("SELECT 1 /* c */; SELECT 2")
    assert len(stmts) == 2


def test_scanners_track_nested_block_comments():
    """Spark SQL parses NESTED bracketed comments (SPARK-28880): an inner
    '*/' must close only one level, so a ';' / ',' / ')' between the
    inner and outer close is still comment content in all three
    scanners (ADVICE r8)."""
    from trino_iceberg_spark.formatting import (
        find_closing_paren,
        split_statements,
        split_top_level_commas,
    )

    # the ';' sits inside the still-open outer comment: one statement
    assert split_statements("/* a /* b */ ; */ SELECT 1") == [
        "/* a /* b */ ; */ SELECT 1"
    ]
    # after the outer comment really closes, splitting resumes
    assert len(split_statements("SELECT 1; /* x /* y */ z */ SELECT 2;")) == 2
    # the ',' between inner and outer close never splits the SET list
    assert split_top_level_commas("a = 1 /* , /* , */ , */, b = 2") == [
        "a = 1 /* , /* , */ , */",
        "b = 2",
    ]
    # the ')' between inner and outer close never counts toward depth
    t = "(f(x /* ) /* ) */ ) */) )"
    assert find_closing_paren(t, 0) == len(t) - 1
    # a nested opener inside a comment leaves it open when only one
    # close follows — the trailing ';' is comment content
    assert len(split_statements("SELECT 1 /* /* */ ; still open")) == 1


# --- round-13: implicit-coercion lattice properties (pure Python) -----------

_INT_TYPES = ["tinyint", "smallint", "int", "bigint"]
_INT_MAX = {"tinyint": 2**7 - 1, "smallint": 2**15 - 1, "int": 2**31 - 1,
            "bigint": 2**63 - 1}


@given(
    src=st.sampled_from(_INT_TYPES + ["float", "double", "string", "date",
                                      "timestamp", "decimal(10,2)"]),
    decl=st.sampled_from(_INT_TYPES + ["float", "double", "string", "date",
                                       "timestamp", "decimal(10,2)",
                                       "decimal(12,2)", "decimal(10,4)"]),
)
def test_insert_coercible_is_superset_of_write_promotable(src, decl):
    """Every writer-sanctioned widening is also an INSERT coercion, and
    identity always coerces — the SQL surface may never be STRICTER than
    the storage layer's own write acceptance."""
    from trino_iceberg_spark.catalog.snapshots import SnapshotTable as T

    if T._write_promotable(src, decl):
        assert T._insert_coercible(src, decl)
    assert T._insert_coercible(src, src)


@given(src=st.sampled_from(_INT_TYPES), decl=st.sampled_from(_INT_TYPES))
def test_integral_coercions_follow_rank(src, decl):
    from trino_iceberg_spark.catalog.snapshots import SnapshotTable as T

    want = _INT_MAX[src] <= _INT_MAX[decl]
    assert T._insert_coercible(src, decl) == want


def test_lossy_directions_refused():
    """The exact refusal set Trino enforces on INSERT: fractional →
    integral, approximate → exact/narrower, string → anything typed,
    timestamp → date."""
    from trino_iceberg_spark.catalog.snapshots import SnapshotTable as T

    refused = [
        ("decimal(2,1)", "bigint"),
        ("double", "bigint"),
        ("double", "float"),
        ("float", "int"),
        ("string", "int"),
        ("string", "double"),
        ("string", "date"),
        ("timestamp", "date"),
        ("decimal(12,2)", "decimal(10,2)"),
        ("decimal(10,4)", "decimal(10,2)"),
        ("bigint", "int"),
    ]
    for src, decl in refused:
        assert not T._insert_coercible(src, decl), (src, decl)
    allowed = [
        ("int", "double"),
        ("bigint", "float"),
        ("decimal(10,2)", "double"),
        ("float", "double"),
        ("int", "decimal(10,2)"),
        ("date", "timestamp"),
        ("void", "bigint"),
    ]
    for src, decl in allowed:
        assert T._insert_coercible(src, decl), (src, decl)


def test_rewrite_trino_limits():
    """Trino's ANSI row-limiting spellings rewrite to Spark's (round
    14): FETCH FIRST/NEXT → LIMIT, OFFSET n ROWS → OFFSET n, Trino's
    OFFSET-before-LIMIT order flips, LIMIT ALL drops — and literals,
    comments and WITH TIES are never touched."""
    from trino_iceberg_spark.formatting import rewrite_trino_limits as rw

    assert (
        rw("SELECT a FROM t ORDER BY a FETCH FIRST 3 ROWS ONLY")
        == "SELECT a FROM t ORDER BY a LIMIT 3"
    )
    assert rw("SELECT a FROM t FETCH NEXT 1 ROW ONLY") == "SELECT a FROM t LIMIT 1"
    assert rw("SELECT a FROM t OFFSET 2 ROWS") == "SELECT a FROM t OFFSET 2"
    assert (
        rw("SELECT a FROM t ORDER BY a OFFSET 2 LIMIT 3")
        == "SELECT a FROM t ORDER BY a LIMIT 3 OFFSET 2"
    )
    # the composed Trino pagination form
    assert (
        rw("SELECT a FROM t ORDER BY a OFFSET 10 ROWS FETCH NEXT 20 ROWS ONLY")
        == "SELECT a FROM t ORDER BY a LIMIT 20 OFFSET 10"
    )
    # subqueries rewrite independently; already-Spark forms unchanged
    assert (
        rw("SELECT * FROM (SELECT a FROM t FETCH FIRST 5 ROWS ONLY) u LIMIT 2 OFFSET 1")
        == "SELECT * FROM (SELECT a FROM t LIMIT 5) u LIMIT 2 OFFSET 1"
    )
    # literals and comments are opaque
    assert (
        rw("SELECT 'FETCH FIRST 3 ROWS ONLY' AS s FROM t")
        == "SELECT 'FETCH FIRST 3 ROWS ONLY' AS s FROM t"
    )
    assert (
        rw("SELECT a -- OFFSET 2 LIMIT 3\nFROM t")
        == "SELECT a -- OFFSET 2 LIMIT 3\nFROM t"
    )
    assert rw("SELECT a FROM t LIMIT ALL").rstrip() == "SELECT a FROM t"
    # WITH TIES is NOT rewritten (needs rank semantics)
    s = "SELECT a FROM t ORDER BY a FETCH FIRST 3 ROWS WITH TIES"
    assert rw(s) == s


def test_trino_limits_end_to_end(spark):
    """FETCH FIRST/OFFSET pagination runs through the client against a
    live session and matches the LIMIT/OFFSET equivalent."""
    from trino_iceberg_spark.client import AthenaSparkClient

    spark.range(100).selectExpr("id AS k").createOrReplaceTempView("rtl_t")
    client = AthenaSparkClient(spark)
    got = [
        r["k"]
        for r in client.query(
            "SELECT k FROM rtl_t ORDER BY k OFFSET 10 ROWS FETCH NEXT 5 ROWS ONLY"
        )
    ]
    assert got == [10, 11, 12, 13, 14]
    assert client.query_scalar(
        "SELECT COUNT(*) FROM (SELECT k FROM rtl_t FETCH FIRST 7 ROWS ONLY)"
    ) == 7


def test_qualified_identifiers_are_not_keywords():
    """Round-14 advisor (low): ``t.end`` inside a CASE must not close
    the CASE early and ``t.case`` must not open one — a keyword preceded
    by ``.`` is a qualified identifier. Backtick-quoted identifiers are
    opaque to every scanner (`` `` `` doubles a literal backtick)."""
    import re

    from trino_iceberg_spark.formatting import (
        _code_mask,
        find_closing_paren,
        finditer_top_level,
        split_top_level_commas,
    )

    THEN = re.compile(r"\bTHEN\b", re.IGNORECASE)
    AND = re.compile(r"\bAND\b", re.IGNORECASE)
    # t.end must not decrement case_depth: the CASE's own THEN stays
    # internal and only the outer THEN is top-level
    s = "CASE WHEN t.end > 5 THEN 1 ELSE 2 END THEN UPDATE"
    ms = finditer_top_level(THEN, s)
    assert len(ms) == 1 and s[ms[0].start() :].startswith("THEN UPDATE")
    # t.case must not increment case_depth: the THEN stays top-level
    assert len(finditer_top_level(THEN, "t.case = 3 AND x THEN y")) == 1
    # backtick identifiers are opaque regions in all four scanners
    assert len(finditer_top_level(AND, "`weird AND name` = 1 AND b = 2")) == 1
    assert len(finditer_top_level(AND, "a = `x``AND y` AND b")) == 1
    assert split_statements("select `a;b` from t; select 1") == [
        "select `a;b` from t",
        "select 1",
    ]
    assert split_top_level_commas("a = `x,y`, b = 2") == ["a = `x,y`", "b = 2"]
    assert find_closing_paren("(`a)b` )") == 7
    mask = _code_mask("select `offset` from t")
    assert not any(mask[7:15])  # the quoted identifier is not code


def test_merge_with_columns_named_end_and_case(spark, tmp_path):
    """End-to-end pin for the kw() fix: a MERGE whose AND-condition
    references columns literally named ``end`` (backticked) must split
    its clauses correctly instead of erroring as malformed."""
    from trino_iceberg_spark.catalog.snapshots import SnapshotTable
    from trino_iceberg_spark.client import AthenaSparkClient

    tdir = str(tmp_path / "kwtab")
    t = SnapshotTable(spark, tdir)
    t.append(
        spark.createDataFrame(
            [(1, 10, 0.0), (2, 3, 0.0), (3, 99, 0.0)],
            "k bigint, `end` bigint, v double",
        )
    )
    client = AthenaSparkClient(spark)
    client.register_snapshot_table("kwtab", tdir)
    spark.createDataFrame([(1,), (2,)], "k bigint").createOrReplaceTempView(
        "kwtab_src"
    )
    n = client.execute(
        """
        MERGE INTO kwtab t USING kwtab_src s
        ON t.k = s.k
        WHEN MATCHED AND t.`end` > 5 THEN UPDATE SET v = 1.0
        WHEN MATCHED THEN DELETE
        """
    )
    assert n == 2
    rows = {r.k: (r["end"], r.v) for r in t.read().collect()}
    assert rows == {1: (10, 1.0), 3: (99, 0.0)}
