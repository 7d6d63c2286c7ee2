"""Presto REST client protocol (rest_server.py): the POST /v1/statement
→ follow nextUri handshake presto-cli performs, over a real HTTP socket
against the shared engine session."""

from __future__ import annotations

import json
import urllib.request

import pytest

from presto_on_ray_spark.engine import Engine
from presto_on_ray_spark.rest_server import PrestoRestServer, _presto_type


@pytest.fixture(scope="module")
def rest(spark, sf_dir):
    eng = Engine(spark).register_tables(sf_dir)
    srv = PrestoRestServer(eng).start()
    yield srv
    srv.stop()


def _post(url: str, sql: str) -> dict:
    req = urllib.request.Request(
        f"{url}/v1/statement", data=sql.encode(), method="POST"
    )
    with urllib.request.urlopen(req) as resp:
        return json.load(resp)


def _get(uri: str) -> dict:
    with urllib.request.urlopen(uri) as resp:
        return json.load(resp)


def _run(url: str, sql: str) -> dict:
    """The presto-cli loop: submit, follow nextUri to completion."""
    page = _post(url, sql)
    while "nextUri" in page:
        page = _get(page["nextUri"])
    return page


def test_handshake_two_pages(rest):
    first = _post(rest.url, "SELECT 1 AS x")
    assert first["stats"]["state"] == "RUNNING"
    assert first["columns"] == [{"name": "x", "type": "integer"}]
    assert "nextUri" in first and "data" not in first
    final = _get(first["nextUri"])
    assert final["stats"]["state"] == "FINISHED"
    assert final["data"] == [[1]]


def test_presto_dialect_over_the_wire(rest):
    final = _run(
        rest.url,
        "SELECT l_returnflag, approx_distinct(l_orderkey) AS orders"
        " FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    )
    assert final["stats"]["state"] == "FINISHED"
    assert [c["name"] for c in final["columns"]] == ["l_returnflag", "orders"]
    assert [c["type"] for c in final["columns"]] == ["varchar", "bigint"]
    assert len(final["data"]) == 3


def test_complex_type_rendering(rest):
    final = _run(
        rest.url,
        "SELECT ARRAY[1, 2] AS arr, MAP(ARRAY['a'], ARRAY[1.5]) AS m,"
        " DATE '2020-01-02' AS d, DECIMAL '1.25' AS dec",
    )
    cols = {c["name"]: c["type"] for c in final["columns"]}
    assert cols["arr"] == "array(integer)"
    assert cols["m"] == "map(varchar, decimal(2,1))"
    assert cols["d"] == "date"
    assert cols["dec"] == "decimal(3,2)"
    row = final["data"][0]
    assert row[0] == [1, 2]
    assert row[1] == {"a": "1.5"}
    assert row[2] == "2020-01-02"
    assert row[3] == "1.25"


def test_error_shape(rest):
    page = _post(rest.url, "SELECT definitely_not_a_function(1)")
    assert page["stats"]["state"] == "FAILED"
    assert "message" in page["error"] and page["error"]["errorName"]


def test_statement_returning_ok(rest):
    page = _post(rest.url, "SET SESSION scheduler_pool = 'wire'")
    assert page["stats"]["state"] == "FINISHED"
    assert page["data"] == [["OK"]]
    _post(rest.url, "RESET SESSION scheduler_pool")


def test_cancel_then_page_fails(rest):
    first = _post(rest.url, "SELECT 42 AS x")
    qid = first["id"]
    req = urllib.request.Request(
        f"{rest.url}/v1/statement/{qid}", method="DELETE"
    )
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 204
    final = _get(first["nextUri"])
    assert final["stats"]["state"] == "FAILED"


def test_type_rendering_unit():
    from pyspark.sql import types as T

    assert _presto_type(T.LongType()) == "bigint"
    assert _presto_type(T.StringType()) == "varchar"
    assert (
        _presto_type(T.StructType([T.StructField("a", T.IntegerType())]))
        == "row(a integer)"
    )


def test_next_uri_page_is_retryable(rest):
    first = _post(rest.url, "SELECT 7 AS x")
    a = _get(first["nextUri"])
    b = _get(first["nextUri"])  # protocol-sanctioned retry
    assert a["data"] == b["data"] == [[7]]
    assert b["stats"]["state"] == "FINISHED"


def test_nonfinite_double_wire_spellings(rest):
    final = _run(rest.url, "SELECT nan() AS a, infinity() AS b, -infinity() AS c")
    assert final["data"][0] == ["NaN", "Infinity", "-Infinity"]


def test_next_uri_uses_host_header(rest):
    import urllib.request as _u

    req = _u.Request(
        f"{rest.url}/v1/statement", data=b"SELECT 1 AS x", method="POST",
        headers={"Host": "example.test:9999"},
    )
    with _u.urlopen(req) as resp:
        first = json.load(resp)
    assert first["nextUri"].startswith("http://example.test:9999/")
