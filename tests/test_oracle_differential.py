"""The big gate: every suite query with an oracle must match DuckDB
exactly at sf0.01 — a local replica of the driver's correctness run."""

from __future__ import annotations

import pytest

from presto_on_ray_spark import suite
from tests.oracle_harness import duckdb_connection, run_one

suite.load_all()

ORACLE_QUERIES = sorted(suite.ORACLES)


@pytest.fixture(scope="module")
def con(sf_correct):
    c = duckdb_connection(sf_correct)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, con, sf_correct, name):
    problems = run_one(
        spark, con, name, suite.QUERIES[name], suite.ORACLES[name], sf_correct
    )
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize(
    "name", sorted(set(suite.QUERIES) - set(suite.ORACLES))
)
def test_rows_only_queries_run(spark, sf_correct, name):
    df = suite.QUERIES[name](spark, sf_correct)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
