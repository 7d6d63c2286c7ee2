"""Differential fuzzing of the SQL front door: hypothesis generates
random scalar-expression trees from a deterministic, engine-portable
grammar (integer arithmetic, string functions — spelled identically in
Presto, Spark, and DuckDB), runs each through Engine.sql AND DuckDB
over the same inline table, and requires exact agreement.

This covers the axis the curated suites can't: arbitrary COMPOSITIONS
of rewrites (the literal-shield and wrapper-ordering bug classes were
composition bugs). Floats/transcendentals are excluded by construction
(no cross-engine ulp noise); division/modulo are excluded (div-by-zero
and truncation-direction differences are separately pinned tests).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from presto_on_ray_spark.engine import Engine

ROWS = [(0, "Alpha"), (3, "bravo charlie"), (7, "d'Elta"), (12, "")]
VALUES_SQL = "(VALUES " + ", ".join(
    f"({x}, '{s.replace(chr(39), chr(39) * 2)}')" for x, s in ROWS
) + ") t(x, s)"


def int_exprs(depth: int) -> st.SearchStrategy[str]:
    if depth <= 0:
        return st.sampled_from(["x", "0", "1", "2", "5"])
    sub = int_exprs(depth - 1)
    strs = str_exprs(depth - 1)
    return st.one_of(
        sub,
        st.tuples(sub, sub).map(lambda p: f"({p[0]} + {p[1]})"),
        st.tuples(sub, sub).map(lambda p: f"({p[0]} - {p[1]})"),
        st.tuples(sub, sub).map(lambda p: f"({p[0]} * {p[1]})"),
        sub.map(lambda e: f"abs({e})"),
        st.tuples(sub, sub).map(lambda p: f"least({p[0]}, {p[1]})"),
        st.tuples(sub, sub).map(lambda p: f"greatest({p[0]}, {p[1]})"),
        strs.map(lambda e: f"length({e})"),
        # strpos goes through the Presto->Spark rename (instr) while
        # DuckDB runs its own native strpos — the rename itself is
        # under differential test
        st.tuples(strs, strs).map(lambda p: f"strpos({p[0]}, {p[1]})"),
        st.tuples(sub, sub, sub).map(
            lambda p: f"(CASE WHEN {p[0]} > {p[1]} THEN {p[2]} ELSE {p[0]} END)"
        ),
        bool_exprs(depth - 1).map(lambda b: f"(CASE WHEN {b} THEN 1 ELSE 0 END)"),
    )


def bool_exprs(depth: int) -> st.SearchStrategy[str]:
    ints = int_exprs(max(depth, 0))
    strs = str_exprs(max(depth, 0))
    return st.one_of(
        st.tuples(ints, ints).map(lambda p: f"({p[0]} >= {p[1]})"),
        st.tuples(ints, ints, ints).map(
            lambda p: f"({p[0]} BETWEEN {p[1]} AND {p[2]})"
        ),
        ints.map(lambda e: f"({e} IN (0, 1, 5, 12))"),
        strs.map(lambda e: f"({e} LIKE '%a%')"),
        st.tuples(strs, strs).map(lambda p: f"({p[0]} = {p[1]})"),
    )


def str_exprs(depth: int) -> st.SearchStrategy[str]:
    if depth <= 0:
        return st.sampled_from(["s", "'lit'", "'Ab c'", "''"])
    sub = str_exprs(depth - 1)
    ints = int_exprs(depth - 1)
    return st.one_of(
        sub,
        sub.map(lambda e: f"upper({e})"),
        sub.map(lambda e: f"lower({e})"),
        sub.map(lambda e: f"trim({e})"),
        sub.map(lambda e: f"reverse({e})"),
        st.tuples(sub, sub).map(lambda p: f"({p[0]} || {p[1]})"),
        st.tuples(sub, ints).map(
            lambda p: f"substr({p[0]}, 1, abs({p[1]}))"
        ),
        st.tuples(sub, sub, sub).map(
            lambda p: f"replace({p[0]}, {p[1]}, {p[2]})"
        ),
    )


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@given(expr=st.one_of(int_exprs(3), str_exprs(3)))
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_generated_expressions_agree(eng, duck, expr):
    sql = f"SELECT x, {expr} AS v FROM {VALUES_SQL} ORDER BY x"
    spark_rows = [tuple(r) for r in eng.sql(sql).collect()]
    duck_rows = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert spark_rows == duck_rows, sql
