"""Presto catalog.schema namespaces over the engine's view catalog.

The reference session connects with ``--catalog mysql --schema test``
(reference: presto-mgr.py:268-273; README.md:90) and Presto then
resolves ``user``, ``test.user`` and ``mysql.test.user`` identically.
The engine mirrors that: attach_catalog records the namespace, USE
selects it, and qualified references strip to the registered view.
"""

from __future__ import annotations

import pytest

from presto_on_ray_spark.engine import Engine

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def eng(spark):
    return Engine(spark).register_tables(SF)


def test_three_part_name_resolves(eng):
    n = eng.sql("SELECT count(*) AS n FROM parquet.default.nation").collect()[0][0]
    assert n == 25


def test_two_part_name_resolves_in_current_schema(eng):
    # register_tables made (parquet, default) the current namespace
    n = eng.sql("SELECT count(*) AS n FROM default.nation").collect()[0][0]
    assert n == 25


def test_use_switches_namespace(eng):
    eng.attach_catalog("mysql", "test")
    assert eng.sql("USE mysql.test") is None
    # three-part under the newly attached catalog
    eng.spark.table("nation").createOrReplaceTempView("user_tbl")
    n = eng.sql("SELECT count(*) AS n FROM mysql.test.user_tbl").collect()[0][0]
    assert n == 25


def test_use_unknown_schema_errors(eng):
    with pytest.raises(ValueError, match="not attached"):
        eng.sql("USE mysql.nosuch")


def test_schema_named_alias_not_stripped(eng):
    # subquery alias spelled like the current schema: `default.x` here
    # is a column reference through the alias, and x is not a table —
    # the rewrite must leave it alone
    rows = eng.sql(
        'SELECT "default".x AS v FROM (SELECT 1 AS x) AS "default"'
    ).collect()
    assert rows[0][0] == 1


def test_qualified_name_inside_literal_untouched(eng):
    rows = eng.sql("SELECT 'parquet.default.nation' AS s").collect()
    assert rows[0][0] == "parquet.default.nation"
