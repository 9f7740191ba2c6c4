"""Differential fuzz: random whitelist expressions, Spark vs DuckDB.

Hypothesis generates expression trees from the derived-feature grammar
(arithmetic, ABS/SQRT/LEAST/GREATEST, CASE WHEN, COALESCE/NULLIF with
division guarded) and evaluates each through our expression compiler on
Spark AND as plain SQL on DuckDB over the same rows. Any divergence in
semantics (null propagation, type promotion, function behavior) between
the compiler and ANSI SQL shows up as a value mismatch.

Rounding is deliberately excluded from the grammar: Spark ROUND (HALF_UP)
and DuckDB ROUND (binary) legitimately disagree at .5 boundaries; the
comparison instead uses a relative tolerance on raw doubles.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from raise_featurestore_spark.expressions.compiler import compile_expression

COLS = ("a", "b", "c")

leaf = st.one_of(
    st.sampled_from(COLS),
    st.integers(min_value=-3, max_value=9).map(str),
    st.sampled_from(["0.5", "2.0", "1.5"]),
)


def _expr(depth: int):
    if depth == 0:
        return leaf
    sub = _expr(depth - 1)
    return st.one_of(
        leaf,
        st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        # division always NULLIF-guarded (the validator warns otherwise)
        st.tuples(sub, sub).map(lambda t: f"({t[0]} / NULLIF({t[1]}, 0))"),
        sub.map(lambda e: f"ABS({e})"),
        sub.map(lambda e: f"SQRT(ABS({e}))"),
        st.tuples(sub, sub).map(lambda t: f"COALESCE(NULLIF({t[0]}, 0), {t[1]})"),
        st.tuples(sub, sub, sub).map(
            lambda t: f"CASE WHEN {t[0]} > {t[1]} THEN {t[2]} ELSE {t[1]} END"
        ),
    )


exprs = _expr(3)

ROWS = [
    (1.0, 2.0, 3),
    (-1.5, 0.0, 0),
    (0.0, -2.25, 7),
    (100.5, 0.001, -4),
    (-0.75, 4.0, 2),
    (3.25, -3.25, 1),
]


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame(ROWS, "a double, b double, c int")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a DOUBLE, b DOUBLE, c INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", ROWS)
    return df, con


@settings(max_examples=30, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(expr=exprs)
@pytest.mark.slow
def test_expression_matches_duckdb(frames, expr):
    df, con = frames
    _, col = compile_expression(df, expr)
    got = [r[0] for r in df.select(col.cast("double")).collect()]
    want = [r[0] for r in con.sql(f"SELECT CAST(({expr}) AS DOUBLE) FROM t").fetchall()]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        if g is None or w is None:
            assert g == w, f"{expr}: null divergence {g} vs {w}"
        elif math.isnan(g) or math.isnan(w):
            assert math.isnan(g) and math.isnan(w), f"{expr}: NaN divergence"
        else:
            assert abs(g - w) <= 1e-9 * max(1.0, abs(g), abs(w)), (
                f"{expr}: {g} vs {w}"
            )


# ---------------------------------------------------------------- strings

str_leaf = st.one_of(
    st.sampled_from(["s", "t"]),
    st.sampled_from(["'ab'", "'Hello World'", "''", "' pad '"]),
)


def _str_expr(depth: int):
    if depth == 0:
        return str_leaf
    sub = _str_expr(depth - 1)
    return st.one_of(
        str_leaf,
        sub.map(lambda e: f"UPPER({e})"),
        sub.map(lambda e: f"LOWER({e})"),
        sub.map(lambda e: f"TRIM({e})"),
        sub.map(lambda e: f"LTRIM({e})"),
        sub.map(lambda e: f"RTRIM({e})"),
        st.tuples(sub, sub).map(lambda t: f"CONCAT({t[0]}, {t[1]})"),
        st.tuples(sub, st.integers(1, 3), st.integers(1, 4)).map(
            lambda t: f"SUBSTRING({t[0]}, {t[1]}, {t[2]})"
        ),
    )


str_exprs = _str_expr(3)

STR_ROWS = [
    ("alpha", "Beta"),
    ("  spaced  ", ""),
    ("MiXeD", "x"),
    ("", "  "),
    ("ünïcødé", "日本語"),
]


@pytest.fixture(scope="module")
def str_frames(spark):
    df = spark.createDataFrame(STR_ROWS, "s string, t string")
    con = duckdb.connect()
    con.execute("CREATE TABLE st_t (s VARCHAR, t VARCHAR)")
    con.executemany("INSERT INTO st_t VALUES (?, ?)", STR_ROWS)
    return df, con


@settings(max_examples=30, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(expr=str_exprs)
@pytest.mark.slow
def test_string_expression_matches_duckdb(str_frames, expr):
    """String-function differential fuzz: UPPER/LOWER/TRIM family, CONCAT,
    SUBSTRING — including unicode and empty/whitespace rows — must agree
    byte-for-byte between the compiled Spark Column and DuckDB SQL,
    wrapped in LENGTH+hashable select (string results compared directly)."""
    df, con = str_frames
    _, col = compile_expression(df, expr, known_features={"s", "t"})
    got = [r[0] for r in df.select(col.alias("v")).collect()]
    want = [r[0] for r in con.sql(f"SELECT {expr} AS v FROM st_t").fetchall()]
    assert got == want, f"{expr!r}: spark={got} duckdb={want}"
