"""Per-query resource governance (SURVEY §2.0 row 8 — the reference's
query.max-memory config surface, presto-mgr.py:18-22): FAIR pool
isolation + input-size admission control."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.resource_pools import (
    QueryAdmissionError,
    admit_or_raise,
    estimated_input_bytes,
    query_pool,
)


def test_admission_rejects_oversized_query(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    big = li.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    est = estimated_input_bytes(big)
    assert est > 0
    # a cap below the estimate must reject BEFORE execution
    with pytest.raises(QueryAdmissionError, match="admission"):
        admit_or_raise(big, max_input_bytes=est // 2)
    # an adequate cap admits and the query still runs
    assert admit_or_raise(big, max_input_bytes=est * 2).count() > 0


def test_admission_estimate_shrinks_with_column_pruning(spark, sf_dir):
    """The estimate is plan-aware: a two-column projection must admit
    under a cap that the full-width scan exceeds (column pruning is
    visible in the optimized plan's statistics)."""
    li = t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag", "l_linestatus").agg(
        *[F.max(c).alias(f"m_{c}") for c in li.columns]
    )
    narrow = li.select("l_returnflag").groupBy("l_returnflag").count()
    assert estimated_input_bytes(narrow) < estimated_input_bytes(wide)


def test_query_pool_sets_and_restores_local_property(spark, sf_dir):
    sc = spark.sparkContext
    assert sc.getLocalProperty("spark.scheduler.pool") is None
    with query_pool(spark, "etl-heavy"):
        assert sc.getLocalProperty("spark.scheduler.pool") == "etl-heavy"
        # actions inside the scope run normally
        assert t(spark, sf_dir, "region").count() > 0
    assert sc.getLocalProperty("spark.scheduler.pool") is None


def test_fair_pools_isolate_concurrent_queries(spark, sf_dir):
    """Two queries driven from separate threads in separate pools both
    make progress under FAIR scheduling (the isolation contract; with
    the default FIFO a long scan can head-of-line-block short ones)."""
    import threading

    results: dict[str, int] = {}

    def run(name: str, frac: float):
        with query_pool(spark, name):
            li = t(spark, sf_dir, "lineitem").sample(frac, seed=1)
            results[name] = li.groupBy("l_returnflag").count().count()

    threads = [
        threading.Thread(target=run, args=("heavy", 0.9)),
        threading.Thread(target=run, args=("interactive", 0.1)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
    assert set(results) == {"heavy", "interactive"}
    assert all(v > 0 for v in results.values())


def test_engine_sql_admission_and_pool(spark, sf_dir):
    """The Engine front door exposes both governance halves."""
    from presto_on_ray_spark.engine import Engine

    eng = Engine(spark).register_tables(sf_dir)
    with pytest.raises(QueryAdmissionError):
        eng.sql(
            "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1",
            max_input_bytes=1,
        )
    df = eng.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1",
        max_input_bytes=1 << 40,
        pool="interactive",
    )
    assert df.count() > 0
    assert (
        spark.sparkContext.getLocalProperty("spark.scheduler.pool")
        == "interactive"
    )
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)


def test_watchdog_cancels_heavy_query_while_concurrent_completes(spark, sf_dir):
    """r6: SET SESSION query_max_run_time arms a cancelJobGroup-based
    watchdog — the deliberately heavy query dies mid-flight at the
    deadline while a concurrent query on another thread completes
    untouched (per-thread job groups + FAIR pools)."""
    import threading
    import time

    from presto_on_ray_spark.engine import Engine

    eng = Engine(spark).register_tables(sf_dir)
    eng.sql("SET SESSION query_max_run_time = '2s'")
    # ~2e11 additions: tens of seconds on local[4] if left alone
    heavy = eng.sql("SELECT sum(pmod(id, 1000)) AS s FROM range(200000000000)")
    assert eng.last_job_group is not None and eng.last_job_group.startswith("wdg-")

    side: dict = {}

    def run_light():
        time.sleep(0.3)  # let the heavy query occupy the cluster first
        side["light"] = spark.sql(
            "SELECT count(*) AS n FROM range(1000)"
        ).collect()[0][0]

    th = threading.Thread(target=run_light, daemon=True)
    th.start()
    start = time.monotonic()
    with pytest.raises(Exception) as ei:
        heavy.collect()
    elapsed = time.monotonic() - start
    assert "cancel" in str(ei.value).lower()
    assert elapsed < 30, f"watchdog did not fire in time ({elapsed:.1f}s)"
    th.join(timeout=60)
    assert side.get("light") == 1000
    eng.sql("RESET SESSION query_max_run_time")


def test_watchdog_fast_query_unaffected(spark, sf_dir):
    from presto_on_ray_spark.engine import Engine

    eng = Engine(spark).register_tables(sf_dir)
    eng.sql("SET SESSION query_max_run_time = '60s'")
    assert eng.sql("SELECT count(*) AS n FROM region").collect()[0][0] == 5
    eng.sql("RESET SESSION query_max_run_time")


def test_kill_query_manual(spark, sf_dir):
    """Engine.kill_query cancels by the watchdog-assigned group id."""
    import threading
    import time

    from presto_on_ray_spark.engine import Engine

    eng = Engine(spark).register_tables(sf_dir)
    eng.sql("SET SESSION query_max_run_time = '600s'")  # far-off deadline
    heavy = eng.sql("SELECT sum(pmod(id, 997)) AS s FROM range(200000000000)")
    gid = eng.last_job_group

    killer = threading.Timer(1.5, lambda: eng.kill_query(gid))
    killer.daemon = True
    killer.start()
    start = time.monotonic()
    with pytest.raises(Exception) as ei:
        heavy.collect()
    assert "cancel" in str(ei.value).lower()
    assert time.monotonic() - start < 30
    eng.sql("RESET SESSION query_max_run_time")


def test_duration_literal_parse():
    from presto_on_ray_spark.engine import _parse_duration_seconds

    assert _parse_duration_seconds("100ms") == 0.1
    assert _parse_duration_seconds("2s") == 2.0
    assert _parse_duration_seconds("1.5m") == 90.0
    assert _parse_duration_seconds("2h") == 7200.0
    with pytest.raises(ValueError):
        _parse_duration_seconds("fast")


def test_watchdog_disarmed_and_group_cleared_on_next_query(spark, sf_dir):
    """ADVICE r6: after a watchdog-armed query completes and the session
    property is RESET, the next query on the same thread must (a) cancel
    the stale timer and (b) drop the thread-local job group — otherwise
    the old timer's cancelJobGroup kills the unrelated next query."""
    from presto_on_ray_spark.engine import Engine

    eng = Engine(spark).register_tables(sf_dir)
    eng.sql("SET SESSION query_max_run_time = '30s'")
    assert eng.sql("SELECT count(*) AS n FROM region").collect()[0][0] == 5
    old = eng._watchdog
    assert old is not None and not old.timer.finished.is_set()
    eng.sql("RESET SESSION query_max_run_time")
    df = eng.sql("SELECT count(*) AS n FROM nation")
    # arming/clearing the next query cancelled the previous timer ...
    assert eng._watchdog is None
    assert old.timer.finished.is_set()
    # ... and this thread no longer carries the stale group id
    assert spark.sparkContext.getLocalProperty("spark.jobGroup.id") is None
    assert df.collect()[0][0] == 25


def test_detach_watchdog_transfers_ownership(spark, sf_dir):
    """detach_watchdog hands the timer to an external owner (the REST
    server's streaming path): the next sql() must NOT cancel it."""
    from presto_on_ray_spark.engine import Engine

    eng = Engine(spark).register_tables(sf_dir)
    eng.sql("SET SESSION query_max_run_time = '600s'")
    eng.sql("SELECT count(*) AS n FROM region")
    wd = eng.detach_watchdog()
    assert wd is not None and wd.group.startswith("wdg-")
    eng.sql("RESET SESSION query_max_run_time")
    eng.sql("SELECT 1 AS x").collect()  # would disarm an attached watchdog
    assert not wd.timer.finished.is_set()  # detached: still armed
    wd.disarm()
    assert wd.timer.finished.is_set()


def test_statement_paths_start_clean_of_stale_group(spark, sf_dir):
    """Statement-family paths that run their own Spark jobs (EXPLAIN
    ANALYZE, SHOW STATS) must not execute under a previous query's
    watchdog group: sql() disarms before statement dispatch."""
    from presto_on_ray_spark.engine import Engine

    eng = Engine(spark).register_tables(sf_dir)
    eng.sql("SET SESSION query_max_run_time = '30s'")
    eng.sql("SELECT count(*) AS n FROM region").collect()
    old = eng._watchdog
    assert old is not None
    eng.sql("RESET SESSION query_max_run_time")
    # EXPLAIN ANALYZE runs a count() job; it must run group-free with
    # the stale timer already cancelled
    plan = eng.sql("EXPLAIN ANALYZE SELECT count(*) AS n FROM nation").collect()[0][0]
    assert plan.startswith("Queried 1 rows")
    assert old.timer.finished.is_set()
    assert spark.sparkContext.getLocalProperty("spark.jobGroup.id") is None
