"""Reference-transcript parity (SURVEY §5.2): the only observable query
evidence in the reference is the README demo session — two SQL strings
typed into presto-cli against a 1-row MySQL table user(id, name, age,
income) (reference: README.md:92-110, table rows :93-96). Run the SAME
SQL text through the engine's dialect front door and assert the same
observable results."""

from __future__ import annotations

import pytest

from presto_on_ray_spark.engine import Engine


@pytest.fixture(scope="module")
def eng_with_user(spark):
    eng = Engine(spark)
    user = spark.createDataFrame(
        [(1, "bob", 30, 100000)], ["id", "name", "age", "income"]
    )
    user.createOrReplaceTempView("user")
    return eng


def test_select_star_from_user(eng_with_user):
    # reference README.md:92-100: `select * from user;` -> 1 row
    rows = eng_with_user.sql("select * from user").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id, r.name, r.age, r.income) == (1, "bob", 30, 100000)


def test_sum_income_from_user(eng_with_user):
    # reference README.md:102-110: `select sum(income) from user;` -> 100000
    rows = eng_with_user.sql("select sum(income) from user").collect()
    assert len(rows) == 1
    assert rows[0][0] == 100000


def test_non_utc_session_still_matches_oracle(spark, sf_correct):
    """The driver's session may carry any timezone; load_table must
    repin UTC so timestamp-bearing oracle queries stay hash-stable."""
    from presto_on_ray_spark import suite
    from tests.oracle_harness import duckdb_connection, run_one

    suite.load_all()
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        con = duckdb_connection(sf_correct)
        problems = run_one(
            spark,
            con,
            "datetime_functions",
            suite.QUERIES["datetime_functions"],
            suite.ORACLES["datetime_functions"],
            sf_correct,
        )
        con.close()
        assert not problems, problems
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
