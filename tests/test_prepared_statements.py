"""Presto prepared-statement surface (public Presto 0.248 SQL:
PREPARE / EXECUTE [USING] / DEALLOCATE PREPARE / DESCRIBE
INPUT|OUTPUT — issued by presto-cli itself, which the reference's
shell wraps, presto-mgr.py:268-273). Exercised end-to-end through
Engine.sql and the REPL."""

from __future__ import annotations

import io

import pytest

from presto_on_ray_spark.cli import repl
from presto_on_ray_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark).register_tables(sf_dir)


def test_prepare_execute_using(engine):
    assert engine.sql("PREPARE q1 FROM SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey = ?") is None
    rows = engine.sql("EXECUTE q1 USING 1").collect()
    direct = engine.sql("SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey = 1").collect()
    assert rows == direct and len(rows) == 1


def test_execute_with_string_and_multiple_params(engine):
    engine.sql(
        "PREPARE q2 FROM SELECT count(*) AS n FROM orders "
        "WHERE o_orderstatus = ? AND o_totalprice > ?"
    )
    got = engine.sql("EXECUTE q2 USING 'F', 1000.0").collect()[0].n
    want = engine.sql(
        "SELECT count(*) AS n FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 1000.0"
    ).collect()[0].n
    assert got == want > 0


def test_execute_placeholder_inside_literal_is_not_substituted(engine):
    engine.sql("PREPARE q3 FROM SELECT '?' AS marker, ? AS v")
    row = engine.sql("EXECUTE q3 USING 42").collect()[0]
    assert row.marker == "?" and row.v == 42


def test_execute_arity_mismatch_errors(engine):
    engine.sql("PREPARE q4 FROM SELECT ? AS v")
    with pytest.raises(ValueError, match="parameter"):
        engine.sql("EXECUTE q4 USING 1, 2")
    with pytest.raises(ValueError, match="parameter"):
        engine.sql("EXECUTE q4")


def test_describe_input_and_output(engine):
    engine.sql(
        "PREPARE q5 FROM SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey = ? AND o_orderstatus = ?"
    )
    inputs = engine.sql("DESCRIBE INPUT q5").collect()
    assert [(r.position, r.type) for r in inputs] == [(1, "unknown"), (2, "unknown")]
    outputs = engine.sql("DESCRIBE OUTPUT q5").collect()
    assert [r.column_name for r in outputs] == ["o_orderkey", "o_totalprice"]
    assert [r.type for r in outputs] == ["bigint", "double"]


def test_deallocate_removes_statement(engine):
    engine.sql("PREPARE q6 FROM SELECT 1 AS one")
    assert engine.sql("DEALLOCATE PREPARE q6") is None
    with pytest.raises(ValueError, match="not found"):
        engine.sql("EXECUTE q6")


def test_execute_missing_statement_errors(engine):
    with pytest.raises(ValueError, match="not found"):
        engine.sql("EXECUTE never_prepared")


def test_prepared_statements_through_repl(engine):
    out = io.StringIO()
    stmts = (
        "PREPARE r1 FROM SELECT o_orderkey FROM orders WHERE o_orderkey = ?;\n"
        "EXECUTE r1 USING 2;\n"
        "DEALLOCATE PREPARE r1;\n"
    )
    repl(engine, io.StringIO(stmts), out, interactive=False)
    text = out.getvalue()
    assert text.count("OK") == 2  # PREPARE + DEALLOCATE
    assert "(1 row)" in text  # the EXECUTE result


def test_set_session_query_max_memory_applies_admission(engine):
    from presto_on_ray_spark.resource_pools import QueryAdmissionError

    assert engine.sql("SET SESSION query_max_memory = '1B'") is None
    with pytest.raises(QueryAdmissionError):
        engine.sql("SELECT count(*) AS n FROM lineitem").collect()
    # SHOW SESSION echoes it; RESET restores normal service
    props = {r.name: r.value for r in engine.sql("SHOW SESSION").collect()}
    assert props["query_max_memory"] == "1B"
    assert engine.sql("RESET SESSION query_max_memory") is None
    assert engine.sql("SELECT count(*) AS n FROM lineitem").collect()[0].n > 0


def test_set_session_unknown_property_is_stored_not_fatal(engine):
    engine.sql("SET SESSION some_catalog_prop = 'x'")
    props = {r.name: r.value for r in engine.sql("SHOW SESSION").collect()}
    assert props["some_catalog_prop"] == "x"
    engine.sql("RESET SESSION some_catalog_prop")


def test_unnest_map_two_column_form(engine):
    rows = engine.sql(
        "SELECT t.k, t.v FROM (SELECT MAP(ARRAY['a','b'], ARRAY[1,2]) AS m) s "
        "CROSS JOIN UNNEST(m) AS t(k, v) ORDER BY t.k"
    ).collect()
    assert [(r.k, r.v) for r in rows] == [("a", 1), ("b", 2)]


def test_prepared_dialect_translation_still_applies(engine):
    # the stored statement is Presto dialect; EXECUTE must run it
    # through the same translation path as a direct engine.sql
    engine.sql("PREPARE q7 FROM SELECT approx_distinct(o_custkey) AS d FROM orders WHERE o_orderkey <= ?")
    got = engine.sql("EXECUTE q7 USING 1000").collect()[0].d
    want = engine.sql(
        "SELECT approx_distinct(o_custkey) AS d FROM orders WHERE o_orderkey <= 1000"
    ).collect()[0].d
    assert got == want > 0
