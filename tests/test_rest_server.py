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


# -- round 6: true paging, interval/time rendering, read-only guard ----

@pytest.fixture(scope="module")
def paged(spark, sf_dir):
    """A server with small pages so multi-page streaming is exercised."""
    eng = Engine(spark).register_tables(sf_dir)
    srv = PrestoRestServer(eng, page_rows=3).start()
    yield srv
    srv.stop()


def test_multi_page_round_trip(paged):
    first = _post(paged.url, "SELECT n_nationkey AS k FROM nation ORDER BY n_nationkey LIMIT 10")
    assert first["stats"]["state"] == "RUNNING" and "data" not in first
    pages, page = [], first
    while "nextUri" in page:
        page = _get(page["nextUri"])
        if page["stats"]["state"] == "FAILED":
            raise AssertionError(page["error"])
        pages.append(page)
    # 10 rows at page_rows=3 -> per-page row counts 3,3,3,1
    assert [len(p["data"]) for p in pages] == [3, 3, 3, 1]
    assert [p["stats"]["state"] for p in pages] == [
        "RUNNING", "RUNNING", "RUNNING", "FINISHED"
    ]
    rows = [r[0] for p in pages for r in p["data"]]
    assert rows == list(range(10))


def test_latest_page_is_retryable_mid_stream(paged):
    first = _post(paged.url, "SELECT n_nationkey AS k FROM nation ORDER BY n_nationkey LIMIT 7")
    p1 = _get(first["nextUri"])
    p1_again = _get(first["nextUri"])  # retry before advancing
    assert p1["data"] == p1_again["data"]
    p2 = _get(p1["nextUri"])
    assert len(p2["data"]) == 3
    # page 1 is gone once the client advanced
    stale = _get(first["nextUri"])
    assert stale["stats"]["state"] == "FAILED"
    assert stale["error"]["errorName"] == "PAGE_GONE"
    p3 = _get(p2["nextUri"])
    assert p3["stats"]["state"] == "FINISHED" and len(p3["data"]) == 1


def test_exact_page_boundary_has_no_empty_tail(paged):
    # 6 rows at page_rows=3: exactly 2 pages, the second FINISHED
    first = _post(paged.url, "SELECT n_nationkey AS k FROM nation ORDER BY n_nationkey LIMIT 6")
    p1 = _get(first["nextUri"])
    assert len(p1["data"]) == 3 and "nextUri" in p1
    p2 = _get(p1["nextUri"])
    assert len(p2["data"]) == 3
    assert p2["stats"]["state"] == "FINISHED" and "nextUri" not in p2


def test_interval_and_time_wire_rendering(rest):
    final = _run(rest.url, "SELECT parse_duration('5 m') AS d")
    assert final["stats"]["state"] == "FINISHED"
    assert final["data"][0][0] == "0 00:05:00.000"


def test_json_value_timedelta_time_unit():
    import datetime as dt

    from presto_on_ray_spark.rest_server import _json_value

    assert _json_value(dt.timedelta(minutes=5)) == "0 00:05:00.000"
    assert _json_value(dt.timedelta(days=1, hours=2, milliseconds=7)) == "1 02:00:00.007"
    assert _json_value(dt.timedelta(minutes=-5)) == "-0 00:05:00.000"
    assert _json_value(dt.time(10, 30, 0, 250000)) == "10:30:00.250"


def test_interval_result_round_trips(rest):
    # regression: interval results used to TypeError inside json.dumps
    # (outside the try/except) and drop the connection with no payload
    final = _run(rest.url, "SELECT parse_duration('90 s') AS d")
    assert final["stats"]["state"] == "FINISHED"
    assert final["data"][0][0] == "0 00:01:30.000"


@pytest.fixture(scope="module")
def readonly(spark, sf_dir):
    eng = Engine(spark).register_tables(sf_dir)
    srv = PrestoRestServer(eng, read_only=True).start()
    yield srv
    srv.stop()


def test_read_only_rejects_mutations(readonly):
    for sql in (
        "DELETE FROM nation",
        "CREATE VIEW v_ro AS SELECT 1 AS x",
        "DROP VIEW v_ro",
        "INSERT INTO nation VALUES (1)",
    ):
        page = _post(readonly.url, sql)
        assert page["stats"]["state"] == "FAILED", sql
        assert page["error"]["errorName"] == "PERMISSION_DENIED", sql


def test_read_only_allows_select(readonly):
    final = _run(readonly.url, "SELECT count(*) AS n FROM region")
    assert final["stats"]["state"] == "FINISHED"
    assert final["data"][0][0] == 5


# -- round 7: read-only hardening, resource cleanup, watchdog paging ----

def test_read_only_rejects_comment_prefixed_mutations(readonly):
    """ADVICE r6: a leading comment must not defeat the guard."""
    for sql in (
        "/* harmless */ DROP VIEW v_ro",
        "--\nDELETE FROM nation",
        "/* a */ /* b */ -- c\n CREATE VIEW v_ro2 AS SELECT 1 AS x",
    ):
        page = _post(readonly.url, sql)
        assert page["stats"]["state"] == "FAILED", sql
        assert page["error"]["errorName"] == "PERMISSION_DENIED", sql


def test_read_only_rejects_prepared_mutations(readonly):
    """ADVICE r6: PREPARE p FROM CREATE ... / EXECUTE p must not slip a
    mutating statement past the read-only guard."""
    page = _post(readonly.url, "PREPARE pm FROM CREATE VIEW v_ro3 AS SELECT 1 AS x")
    assert page["stats"]["state"] == "FAILED"
    assert page["error"]["errorName"] == "PERMISSION_DENIED"
    # even a prepared statement registered in-process (bypassing the
    # server) is caught when EXECUTEd over the wire
    readonly.engine._prepared["pm2"] = "DROP VIEW v_ro3"
    page = _post(readonly.url, "EXECUTE pm2")
    assert page["stats"]["state"] == "FAILED"
    assert page["error"]["errorName"] == "PERMISSION_DENIED"
    # read-only PREPARE/EXECUTE still work
    ok = _post(readonly.url, "PREPARE ps FROM SELECT count(*) AS n FROM region")
    assert ok["stats"]["state"] == "FINISHED"
    final = _run(readonly.url, "EXECUTE ps")
    assert final["data"][0][0] == 5


def test_read_only_rejects_wrapped_mutations(readonly):
    """ADVICE r7: EXPLAIN [(opts)] [ANALYZE] and SHOW STATS FOR (...)
    dispatch their INNER statement through Engine.sql, so the guard
    must recurse through the wrappers — 'EXPLAIN DELETE FROM nation'
    on a read_only server used to rewrite the table before erroring."""
    for sql in (
        "EXPLAIN DELETE FROM nation",
        "EXPLAIN ANALYZE DELETE FROM nation",
        "EXPLAIN ANALYZE INSERT INTO nation SELECT * FROM nation",
        "EXPLAIN (TYPE VALIDATE) CREATE VIEW v_ro4 AS SELECT 1 AS x",
        "EXPLAIN EXPLAIN ANALYZE DELETE FROM nation",
        "SHOW STATS FOR (DELETE FROM nation)",
        "explain /* c */ drop view v_ro4",
        # a plan-only write wrapper whose BODY mutates must still fail
        "EXPLAIN INSERT INTO nation DELETE FROM nation",
    ):
        page = _post(readonly.url, sql)
        assert page["stats"]["state"] == "FAILED", sql
        assert page["error"]["errorName"] == "PERMISSION_DENIED", sql
    # and the table is untouched
    final = _run(readonly.url, "SELECT count(*) AS n FROM nation")
    assert final["data"][0][0] == 25
    # read-only EXPLAIN / SHOW STATS still work — including plain
    # EXPLAIN of INSERT/CTAS, which the engine plans without executing
    final = _run(readonly.url, "EXPLAIN SELECT count(*) AS n FROM region")
    assert final["stats"]["state"] == "FINISHED"
    final = _run(readonly.url, "SHOW STATS FOR (SELECT n_name FROM nation)")
    assert final["stats"]["state"] == "FINISHED"
    final = _run(
        readonly.url, "EXPLAIN INSERT INTO nation SELECT * FROM nation"
    )
    assert final["stats"]["state"] == "FINISHED"
    assert final["data"][0][0].startswith("TableWriter[nation]")
    final = _run(readonly.url, "SELECT count(*) AS n FROM nation")
    assert final["data"][0][0] == 25


def test_failed_submit_disarms_detached_watchdog(spark, sf_dir):
    """ADVICE r7: if the work after detach_watchdog() raises in
    _submit, the detached watchdog's Timer must be disarmed on the
    failure path (not left running until query_max_run_time)."""
    eng = Engine(spark).register_tables(sf_dir)
    srv = PrestoRestServer(eng).start()
    real_sql = eng.sql

    def sql_with_bad_iterator(stmt, **kw):
        df = real_sql(stmt, **kw)
        sql_with_bad_iterator.wd = eng._watchdog  # armed on THIS thread

        class _BadDF:
            schema = df.schema

            def limit(self, n):
                return self

            def toLocalIterator(self):
                raise RuntimeError("boom in iterator")

        return _BadDF()

    try:
        real_sql("SET SESSION query_max_run_time = '600s'")
        eng.sql = sql_with_bad_iterator
        try:
            page = _post(srv.url, "SELECT n_nationkey AS k FROM nation")
        finally:
            del eng.sql
            real_sql("RESET SESSION query_max_run_time")
        assert page["stats"]["state"] == "FAILED"
        assert "boom in iterator" in page["error"]["message"]
        wd = sql_with_bad_iterator.wd
        assert wd is not None
        assert wd.timer.finished.is_set()  # disarmed, not ticking
    finally:
        srv.stop()


def test_eviction_and_delete_close_open_iterators(spark, sf_dir):
    """ADVICE r6: LRU eviction and DELETE must close the underlying
    toLocalIterator (driver socket + partially-run job), not wait for
    Python GC."""
    import urllib.request as _u

    eng = Engine(spark).register_tables(sf_dir)
    srv = PrestoRestServer(eng, page_rows=2)
    srv._max_buffered = 1
    srv.start()
    try:
        first = _post(srv.url, "SELECT n_nationkey AS k FROM nation")
        with srv._lock:
            state1 = srv._results[first["id"]]
        second = _post(srv.url, "SELECT r_regionkey AS k FROM region")
        with srv._lock:
            assert first["id"] not in srv._results  # evicted (LRU=1)
            state2 = srv._results[second["id"]]
        assert list(state1.it) == []  # closed: iterator replaced/drained
        req = _u.Request(f"{srv.url}/v1/statement/{second['id']}", method="DELETE")
        with _u.urlopen(req) as resp:
            assert resp.status == 204
        assert list(state2.it) == []
    finally:
        srv.stop()


def test_watchdog_applies_to_paged_results(spark, sf_dir):
    """ADVICE r6: the watchdog/pool properties are thread-local, but
    pages are served on other threads — the server detaches the
    watchdog at submit and sets its group id / pool around the
    toLocalIterator() call, whose JVM serving thread inherits them at
    iterator-creation time (nothing is re-applied per pull), then
    disarms the watchdog when the stream completes. A later submit
    must not disarm a still-streaming query's kill switch."""
    eng = Engine(spark).register_tables(sf_dir)
    srv = PrestoRestServer(eng, page_rows=2).start()
    try:
        eng.sql("SET SESSION query_max_run_time = '600s'")
        first = _post(srv.url, "SELECT n_nationkey AS k FROM nation LIMIT 5")
        with srv._lock:
            st = srv._results[first["id"]]
        assert st.watchdog is not None and st.watchdog.group.startswith("wdg-")
        eng.sql("RESET SESSION query_max_run_time")
        # an unrelated submit on the engine does not kill the stream
        _run(srv.url, "SELECT 1 AS x")
        assert not st.watchdog.timer.finished.is_set()
        page = first
        while "nextUri" in page:
            page = _get(page["nextUri"])
        assert page["stats"]["state"] == "FINISHED"
        assert st.watchdog is None  # disarmed on completion
    finally:
        srv.stop()


def test_delete_interrupts_in_flight_page(spark, sf_dir):
    """Cancellation must INTERRUPT a page pull blocked on a heavy
    partition job (cancelJobGroup on the query's own group), not wait
    behind it — and the interrupted fetch must report a cancellation,
    never FINISHED."""
    import threading
    import time
    import urllib.request as _u

    eng = Engine(spark).register_tables(sf_dir)
    srv = PrestoRestServer(eng, page_rows=10).start()
    try:
        # Multi-partition streaming result whose FIRST page needs a
        # seconds-long partition job, so the pull genuinely blocks
        # in-flight. (A global aggregate would run its single job
        # synchronously inside _submit instead — toPythonIterator
        # computes the first job on the submit thread — and leave
        # nothing to interrupt at page time.)
        first = _post(
            srv.url,
            "SELECT id FROM range(0, 200000000000, 1, 32)"
            " WHERE pmod(id, 997) = 0 AND pmod(id, 991) = 0",
        )
        assert first["stats"]["state"] == "RUNNING"
        result: dict = {}

        def fetch():
            result["page"] = _get(first["nextUri"])

        th = threading.Thread(target=fetch, daemon=True)
        th.start()
        time.sleep(1.0)  # let the pull block inside the Spark job
        t0 = time.monotonic()
        req = _u.Request(f"{srv.url}/v1/statement/{first['id']}", method="DELETE")
        with _u.urlopen(req) as resp:
            assert resp.status == 204
        delete_elapsed = time.monotonic() - t0
        assert delete_elapsed < 5, f"DELETE blocked {delete_elapsed:.1f}s behind the pull"
        th.join(timeout=30)
        assert not th.is_alive(), "page pull was not interrupted"
        page = result["page"]
        assert page["stats"]["state"] == "FAILED"
        assert page["error"]["errorName"] in ("QUERY_CANCELLED", "NOT_FOUND")
    finally:
        srv.stop()


def test_read_only_rejects_cte_and_from_prefixed_writes(readonly):
    """Review r8 round 3: 'WITH s AS (...) INSERT ...' and Hive-style
    'FROM t INSERT ...' are writes Spark executes — the read-only guard
    classifies them through the engine's shared normalized view."""
    for sql in (
        "WITH s AS (SELECT 1 AS x) INSERT INTO nation SELECT * FROM nation",
        "FROM nation INSERT INTO nation SELECT 1",
        "EXPLAIN WITH s AS (SELECT 1 AS x) INSERT INTO nation SELECT * FROM s",
    ):
        page = _post(readonly.url, sql)
        assert page["stats"]["state"] == "FAILED", sql
        assert page["error"]["errorName"] == "PERMISSION_DENIED", sql
    # CTE queries still run
    final = _run(readonly.url, "WITH s AS (SELECT 19 AS x) SELECT x FROM s")
    assert final["data"][0][0] == 19
    final = _run(readonly.url, "SELECT count(*) AS n FROM nation")
    assert final["data"][0][0] == 25


def test_read_only_dual_lexer_payloads(readonly):
    """Review r8 round 4: live-verified bypass payloads (backtick CTE
    name, backslash-escaped quote, nested comment) must classify as
    writes on a read-only server."""
    for sql in (
        "WITH `my cte` AS (SELECT 1) INSERT INTO nation SELECT 1",
        "WITH s AS (SELECT '\\'' AS q) INSERT INTO nation SELECT 1",
        "/* a /* b */ c */ INSERT INTO nation SELECT 41",
    ):
        page = _post(readonly.url, sql)
        assert page["stats"]["state"] == "FAILED", sql
        assert page["error"]["errorName"] == "PERMISSION_DENIED", sql
    # benign lookalikes still run
    final = _run(readonly.url, "FROM region SELECT r_name AS `insert` LIMIT 1")
    assert final["stats"]["state"] == "FINISHED"
    final = _run(readonly.url, "SELECT count(*) AS n FROM nation")
    assert final["data"][0][0] == 25
