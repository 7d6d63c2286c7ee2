"""Engine front-door behavior: catalog metadata (SURVEY §2.1
information_schema parity), dialect SQL execution, both front doors
converging on one plan."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from presto_on_ray_spark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return Engine(spark).register_tables(sf_dir)


def test_show_tables_lists_catalog(eng):
    # SHOW TABLES is Presto-shaped since r5: one `Table` column
    names = {r.Table for r in eng.sql("SHOW TABLES").collect()}
    for t_ in ["lineitem", "orders", "customer", "documents", "embeddings"]:
        assert t_ in names


def test_describe_table(eng):
    cols = {r.col_name for r in eng.sql("DESCRIBE lineitem").collect()}
    assert {"l_orderkey", "l_quantity", "l_shipdate"} <= cols


def test_both_front_doors_same_result(eng, spark, sf_dir):
    via_sql = eng.sql(
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag"
    )
    via_df = (
        eng.table("lineitem").groupBy("l_returnflag").agg(F.count("*").alias("n"))
    )
    assert {tuple(r) for r in via_sql.collect()} == {tuple(r) for r in via_df.collect()}


def test_presto_names_resolve_through_dialect(eng):
    row = eng.sql(
        """
        SELECT approx_distinct(l_suppkey) AS d,
               strpos('hello', 'll') AS p,
               cardinality(array(1, 2, 3)) AS c
        FROM lineitem
        """
    ).collect()[0]
    assert row.d > 0 and row.p == 3 and row.c == 3


def test_explain_returns_formatted_plan(eng):
    text = eng.explain("SELECT count(*) FROM lineitem")
    assert "Physical Plan" in text


def test_cluster_control_status(spark):
    from presto_on_ray_spark.cluster import ClusterControl

    ctl = ClusterControl(spark)
    s = ctl.status()
    assert s["n_executors"] >= 1
    assert s["master"].startswith("local")
    assert ctl.coordinator() == s["master"]
    # worker verbs are documented no-ops on local masters
    assert ctl.request_workers(2) is False
    assert ctl.remove_workers(["1"]) is False


def test_dialect_joda_and_iso(eng):
    row = eng.sql(
        """
        SELECT format_datetime(TIMESTAMP '2024-03-05 07:09:00', 'yyyy/MM/dd') AS f,
               from_iso8601_timestamp('2024-03-05T07:09:00') AS ts
        """
    ).collect()[0]
    assert row.f == "2024/03/05"
    assert row.ts.month == 3 and row.ts.hour == 7
