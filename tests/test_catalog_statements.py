"""Presto catalog/DDL statement family through Engine.sql (r5
statement-surface audit): SHOW CATALOGS/SCHEMAS/TABLES/FUNCTIONS with
SQL-LIKE patterns (Presto % / _ — Spark's native SHOW uses fs-glob, so
an unconverted pattern silently matches nothing), SHOW CREATE TABLE
over registered views, CREATE/DROP VIEW, emulated DELETE FROM, and
no-op transaction control. The reference exposes all of these through
presto-cli (reference: presto-mgr.py:268-273)."""

from __future__ import annotations

import pytest

from presto_on_ray_spark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return Engine(spark).register_tables(sf_dir)


def test_show_catalogs_lists_attached(eng):
    names = [r[0] for r in eng.sql("SHOW CATALOGS").collect()]
    assert "parquet" in names and "spark_catalog" in names


def test_show_catalogs_like_percent(eng):
    names = [r[0] for r in eng.sql("SHOW CATALOGS LIKE 'parq%'").collect()]
    assert names == ["parquet"]
    assert eng.sql("SHOW CATALOGS LIKE 'zzz%'").collect() == []


def test_show_schemas_from_catalog(eng):
    names = [r[0] for r in eng.sql("SHOW SCHEMAS FROM parquet").collect()]
    assert names == ["default"]


def test_show_tables_like_sql_pattern(eng):
    names = [r[0] for r in eng.sql("SHOW TABLES LIKE 'line%'").collect()]
    assert names == ["lineitem"]
    # single-char wildcard
    names = [r[0] for r in eng.sql("SHOW TABLES LIKE 'nat_on'").collect()]
    assert names == ["nation"]


def test_show_functions_like(eng):
    names = [r[0] for r in eng.sql("SHOW FUNCTIONS LIKE 'array%'").collect()]
    assert names and all(n.startswith("array") for n in names)
    assert "array_sum" in names


def test_show_create_table_synthesized(eng):
    [(ddl,)] = eng.sql("SHOW CREATE TABLE nation").collect()
    assert ddl.startswith("CREATE TABLE nation")
    # Presto type rendering since r5b (varchar, not Spark's string)
    assert "n_nationkey" in ddl and "n_name varchar" in ddl


def test_create_query_drop_view(eng):
    eng.sql("CREATE VIEW v_stmt_test AS SELECT n_nationkey FROM nation WHERE n_nationkey < 3")
    assert eng.sql("SELECT COUNT(*) AS n FROM v_stmt_test").collect()[0][0] == 3
    # OR REPLACE re-points the same name
    eng.sql("CREATE OR REPLACE VIEW v_stmt_test AS SELECT n_nationkey FROM nation WHERE n_nationkey < 5")
    assert eng.sql("SELECT COUNT(*) AS n FROM v_stmt_test").collect()[0][0] == 5
    assert eng.sql("DROP VIEW v_stmt_test") is None
    assert not eng.spark.catalog.tableExists("v_stmt_test")


def test_delete_from_emulated(eng):
    eng.spark.sql("DROP TABLE IF EXISTS t_del_test")
    eng.sql("CREATE TABLE t_del_test AS SELECT n_nationkey AS k FROM nation")
    before = eng.sql("SELECT COUNT(*) AS n FROM t_del_test").collect()[0][0]
    [(deleted,)] = eng.sql("DELETE FROM t_del_test WHERE k >= 20").collect()
    assert deleted == before - 20
    assert eng.sql("SELECT COUNT(*) AS n FROM t_del_test").collect()[0][0] == 20
    # NULL predicates retain rows (SQL DELETE semantics)
    [(deleted,)] = eng.sql("DELETE FROM t_del_test WHERE NULLIF(k, k) > 0").collect()
    assert deleted == 0
    # unconditional DELETE empties the table
    [(deleted,)] = eng.sql("DELETE FROM t_del_test").collect()
    assert deleted == 20
    assert eng.sql("SELECT COUNT(*) AS n FROM t_del_test").collect()[0][0] == 0
    eng.spark.sql("DROP TABLE t_del_test")


def test_transaction_control_noops(eng):
    assert eng.sql("START TRANSACTION") is None
    assert eng.sql("COMMIT") is None
    assert eng.sql("ROLLBACK WORK") is None


def test_show_stats_and_session_unaffected(eng):
    # the new SHOW interceptors must not swallow the existing ones
    assert eng.sql("SHOW STATS FOR nation").count() > 0
    assert eng.sql("SHOW SESSION") is not None


def test_qualified_names_in_show_create_and_delete(eng):
    # attached catalog.schema prefixes must resolve here like they do
    # in SELECT (review finding: REQUIRES_SINGLE_PART_NAMESPACE)
    [(ddl,)] = eng.sql("SHOW CREATE TABLE parquet.default.nation").collect()
    assert ddl.startswith("CREATE TABLE nation")
    eng.spark.sql("DROP TABLE IF EXISTS t_del_q")
    eng.sql("CREATE TABLE t_del_q AS SELECT n_nationkey AS k FROM nation")
    [(deleted,)] = eng.sql("DELETE FROM parquet.default.t_del_q WHERE k >= 20").collect()
    assert deleted == 5
    eng.spark.sql("DROP TABLE t_del_q")


def test_delete_from_registered_view_errors_loudly(eng):
    # the fixture views are read-only; a silent managed-table swap
    # would desynchronize Engine.table() from the SQL path
    with pytest.raises(ValueError, match="view"):
        eng.sql("DELETE FROM nation WHERE n_nationkey = 0")
    # and the view still reads the full fixture
    assert eng.sql("SELECT COUNT(*) AS n FROM nation").collect()[0][0] == 25


def test_show_tables_from_real_database(eng):
    eng.spark.sql("CREATE DATABASE IF NOT EXISTS showdb")
    eng.spark.sql("DROP TABLE IF EXISTS showdb.t_in_db")
    eng.spark.sql("CREATE TABLE showdb.t_in_db AS SELECT 1 AS x")
    names = [r[0] for r in eng.sql("SHOW TABLES FROM showdb").collect()]
    assert "t_in_db" in names
    eng.spark.sql("DROP TABLE showdb.t_in_db")
    eng.spark.sql("DROP DATABASE showdb")


def test_delete_view_guard_is_case_insensitive(eng):
    # Spark stores identifiers lowercased; an uppercase spelling must
    # not bypass the view guard and destroy the registered view
    with pytest.raises(ValueError, match="view"):
        eng.sql("DELETE FROM NATION WHERE n_nationkey = 0")
    assert eng.sql("SELECT COUNT(*) AS n FROM nation").collect()[0][0] == 25


def test_show_tables_from_attached_catalog_schema(eng):
    # FROM catalog.schema of an ATTACHED namespace lists the registered
    # views (it is not a real Spark database)
    names = [r[0] for r in eng.sql("SHOW TABLES FROM parquet.default").collect()]
    assert "lineitem" in names and "nation" in names


def test_show_tables_real_db_excludes_temp_views(eng):
    eng.spark.sql("CREATE DATABASE IF NOT EXISTS showdb2")
    eng.spark.sql("DROP TABLE IF EXISTS showdb2.t_only")
    eng.spark.sql("CREATE TABLE showdb2.t_only AS SELECT 1 AS x")
    names = [r[0] for r in eng.sql("SHOW TABLES FROM showdb2").collect()]
    assert names == ["t_only"]  # no fixture temp views leaking in
    eng.spark.sql("DROP TABLE showdb2.t_only")
    eng.spark.sql("DROP DATABASE showdb2")


def test_delete_qualified_table_despite_view_name_collision(eng):
    # a real table in another database shares the bare name 'nation'
    # with the registered view; the qualified DELETE must hit the TABLE
    eng.spark.sql("CREATE DATABASE IF NOT EXISTS showdb3")
    eng.spark.sql("DROP TABLE IF EXISTS showdb3.nation")
    eng.spark.sql(
        "CREATE TABLE showdb3.nation AS SELECT n_nationkey AS k FROM nation"
    )
    [(deleted,)] = eng.sql("DELETE FROM showdb3.nation WHERE k >= 20").collect()
    assert deleted == 5
    # and the registered view is untouched
    assert eng.sql("SELECT COUNT(*) AS n FROM nation").collect()[0][0] == 25
    eng.spark.sql("DROP TABLE showdb3.nation")
    eng.spark.sql("DROP DATABASE showdb3")


def test_show_columns_presto_shape(eng):
    rows = eng.sql("SHOW COLUMNS FROM nation").collect()
    assert rows[0].__fields__ == ["Column", "Type", "Extra", "Comment"]
    types = {r.Column: r.Type for r in rows}
    assert types["n_name"] == "varchar"
    assert types["n_nationkey"] in ("integer", "bigint")


def test_create_view_without_or_replace_errors_on_existing(eng):
    # Presto: CREATE VIEW on an existing name errors; silently
    # re-pointing the registered fixture view would corrupt every
    # later query against it (registered fixtures report as tables)
    with pytest.raises(ValueError, match="is a table"):
        eng.sql("CREATE VIEW nation AS SELECT 1 AS x")
    assert eng.sql("SELECT COUNT(*) AS n FROM nation").collect()[0][0] == 25
    # a plain USER view without OR REPLACE errors as "already exists"
    eng.sql("CREATE VIEW v_exist_chk AS SELECT 1 AS x")
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("CREATE VIEW v_exist_chk AS SELECT 2 AS x")
    eng.sql("DROP VIEW v_exist_chk")


def test_create_view_with_column_alias_list(eng):
    eng.sql(
        "CREATE VIEW v_aliased (alias_key) AS"
        " SELECT n_nationkey FROM nation WHERE n_nationkey < 4"
    )
    rows = eng.sql("SELECT alias_key FROM v_aliased ORDER BY alias_key").collect()
    assert [r.alias_key for r in rows] == [0, 1, 2, 3]
    eng.sql("DROP VIEW v_aliased")


def test_drop_view_missing_errors_without_if_exists(eng):
    with pytest.raises(Exception):
        eng.sql("DROP VIEW definitely_no_such_view")
    # and IF EXISTS stays a silent no-op
    assert eng.sql("DROP VIEW IF EXISTS definitely_no_such_view") is None


def test_show_schemas_unknown_catalog_errors(eng):
    with pytest.raises(ValueError, match="not attached"):
        eng.sql("SHOW SCHEMAS FROM mysql")
    # spark_catalog scopes to real Spark databases
    names = [r[0] for r in eng.sql("SHOW SCHEMAS FROM spark_catalog").collect()]
    assert "default" in names


def test_map_agg_skips_null_keys(eng):
    got = eng.sql(
        "SELECT map_agg(k, v) AS v"
        " FROM (VALUES ('a', 1), (CAST(NULL AS VARCHAR), 2)) t(k, v)"
    ).collect()[0][0]
    assert got == {"a": 1}
    got = eng.sql(
        "SELECT multimap_agg(k, v) AS v"
        " FROM (VALUES ('a', 1), (CAST(NULL AS VARCHAR), 2), ('a', 3)) t(k, v)"
    ).collect()[0][0]
    assert got == {"a": [1, 3]}


def test_create_or_replace_view_cannot_shadow_catalog_table(eng):
    # OR REPLACE must not shadow a catalog TABLE either (Presto errors
    # when the existing object is a table)
    with pytest.raises(ValueError, match="table"):
        eng.sql("CREATE OR REPLACE VIEW nation AS SELECT 1 AS x")
    assert eng.sql("SELECT COUNT(*) AS n FROM nation").collect()[0][0] == 25


def test_drop_view_if_exists_reaches_permanent_views(eng):
    eng.spark.sql("DROP VIEW IF EXISTS perm_v")
    eng.spark.sql("CREATE VIEW perm_v AS SELECT 1 AS x")  # permanent
    assert eng.sql("DROP VIEW IF EXISTS perm_v") is None
    assert not eng.spark.catalog.tableExists("perm_v")


def test_map_agg_all_null_keys_is_null(eng):
    # Presto returns NULL (state never initialized), not {}
    got = eng.sql(
        "SELECT map_agg(k, v) IS NULL AS v"
        " FROM (VALUES (CAST(NULL AS VARCHAR), 1)) t(k, v)"
    ).collect()[0][0]
    assert got is True
    got = eng.sql(
        "SELECT multimap_agg(k, v) IS NULL AS v"
        " FROM (VALUES (CAST(NULL AS VARCHAR), 1)) t(k, v)"
    ).collect()[0][0]
    assert got is True


# -- round 6: map_agg duplicate keys, qualified CREATE VIEW ------------

def test_map_agg_duplicate_keys_picks_first(eng):
    """Presto's map_agg accepts duplicate keys and picks one value;
    Spark's default mapKeyDedupPolicy=EXCEPTION would throw. The
    dialect rendering dedups to the FIRST occurrence (deterministic)."""
    [(got,)] = eng.sql(
        "SELECT map_agg(k, v) AS m"
        " FROM (VALUES ('a', 1), ('a', 2), ('b', 3)) t(k, v)"
    ).collect()
    assert got == {"a": 1, "b": 3}


def test_map_agg_duplicates_with_null_keys_mixed(eng):
    [(got,)] = eng.sql(
        "SELECT map_agg(k, v) AS m"
        " FROM (VALUES (NULL, 0), ('x', 7), ('x', 8)) t(k, v)"
    ).collect()
    assert got == {"x": 7}


def test_create_view_qualified_unattached_namespace_rejected(eng):
    with pytest.raises(ValueError, match="not an attached"):
        eng.sql("CREATE VIEW someschema.v_q1 AS SELECT 1 AS x")
    with pytest.raises(ValueError, match="not an attached"):
        eng.sql("CREATE VIEW other.someschema.v_q1 AS SELECT 1 AS x")


def test_create_view_qualified_attached_namespace_ok(eng):
    # parquet.default is the attached fixture namespace
    eng.sql("CREATE VIEW parquet.default.v_q2 AS SELECT 2 AS x")
    assert eng.sql("SELECT x FROM v_q2").collect()[0][0] == 2
    eng.sql("CREATE OR REPLACE VIEW default.v_q2 AS SELECT 3 AS x")
    assert eng.sql("SELECT x FROM v_q2").collect()[0][0] == 3
    eng.sql("DROP VIEW v_q2")
