"""Per-query resource governance — the Spark-honest rendering of the
reference's per-query memory caps (SURVEY §2.0 row 8).

The reference's ONE implemented config surface is three Presto memory
properties written into every node's config.properties
(reference: presto-mgr.py:18-22 `ConfConfig.query_max_memory*`,
:65-67 `prep_etc` writing `query.max-memory[-per-node]`): a per-QUERY
admission/kill threshold enforced by Presto's memory tracker. Spark's
memory model is per-EXECUTOR (unified region shared by all concurrent
tasks), so a literal per-query byte cap cannot be enforced inside one
JVM — SCALING.md documents that. What Spark DOES give, and what this
module wires up, is the two halves users actually rely on the Presto
knobs for:

1. **Isolation** — a runaway query must not starve the others.
   Spark: FAIR scheduler pools; each query runs in its own pool with
   equal share, so one heavy query cannot monopolize task slots.
   (`fair_pools_conf`, `query_pool`.)
2. **Admission control** — a query whose input is obviously beyond
   the configured budget should be REJECTED up front, like Presto's
   "Query exceeded per-node memory limit", not discovered via OOM.
   Spark: Catalyst's optimized-plan statistics give an input-bytes
   upper bound before execution (`admit_or_raise`).

Both halves are cheap (driver-side only) and composable with any
suite query; tests/test_resource_pools.py drives them end-to-end.
"""

from __future__ import annotations

import threading
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


class QueryAdmissionError(RuntimeError):
    """Raised when a query's estimated input exceeds the admission cap
    (the engine's analogue of Presto's query.max-memory rejection)."""


class Watchdog:
    """Handle for an armed runtime kill switch: the fresh job group id
    plus the daemon timer that will cancel it, so the owner can DISARM
    (cancel the timer) once the query completes or a new query arms a
    fresh watchdog — otherwise a stale timer could fire into a group id
    a later re-arm on the same thread happens to still carry."""

    __slots__ = ("group", "timer")

    def __init__(self, group: str, timer: threading.Timer):
        self.group = group
        self.timer = timer

    def disarm(self) -> None:
        """Cancel the pending kill (no-op if it already fired)."""
        self.timer.cancel()


def clear_job_group(spark: SparkSession) -> None:
    """Remove the calling thread's job-group local properties (PySpark
    exposes no clearJobGroup; these two properties are exactly what
    setJobGroup sets). Without this, actions run after a watchdog-armed
    query on the same thread would still carry the old group id and be
    collateral damage of its timer."""
    sc = spark.sparkContext
    sc.setLocalProperty("spark.jobGroup.id", None)
    sc.setLocalProperty("spark.job.interruptOnCancel", None)


def arm_watchdog(spark: SparkSession, seconds: float,
                 description: str = "") -> Watchdog:
    """Mid-flight kill switch: scope the CALLING THREAD's next actions
    to a fresh job group and cancel that group after ``seconds``.

    This is the engine's rendering of Presto's query.max-run-time (the
    runtime companion to the reference's query.max-memory family,
    presto-mgr.py:65-67): Spark cannot meter per-query BYTES inside a
    shared JVM (SCALING.md), but it CAN cancel a query's jobs
    wholesale — ``cancelJobGroup`` interrupts every running task of the
    group while other pools/queries keep their tasks. The timer starts
    at arm time (Presto counts from query submission the same way).
    Returns a Watchdog handle; the owner MUST disarm it (or clear the
    thread's job group via clear_job_group) before running unrelated
    work on the same thread, because the group id stays on the thread's
    local properties until replaced."""
    sc = spark.sparkContext
    gid = f"wdg-{uuid.uuid4().hex[:12]}"
    sc.setJobGroup(gid, description or f"query_max_run_time={seconds}s",
                   interruptOnCancel=True)
    timer = threading.Timer(seconds, lambda: sc.cancelJobGroup(gid))
    timer.daemon = True
    timer.start()
    return Watchdog(gid, timer)


def fair_pools_conf() -> dict[str, str]:
    """Conf entries enabling FAIR scheduling so per-query pools share
    task slots fairly (pass to get_spark(extra_conf=...)). Without an
    allocation file every dynamically-named pool gets default weight 1
    — equal shares, which is exactly the isolation contract here."""
    return {"spark.scheduler.mode": "FAIR"}


@contextmanager
def query_pool(spark: SparkSession, name: str):
    """Run the enclosed actions in a dedicated FAIR scheduler pool.

    Spark scopes `spark.scheduler.pool` to the thread setting it, so
    concurrent queries driven from different threads land in different
    pools and split task slots fairly — one scan-heavy query cannot
    starve a short interactive one (the practical reason Presto users
    set query.max-memory-per-node on the reference)."""
    sc = spark.sparkContext
    sc.setLocalProperty("spark.scheduler.pool", name)
    try:
        yield
    finally:
        sc.setLocalProperty("spark.scheduler.pool", None)


def estimated_input_bytes(df: DataFrame) -> int:
    """Catalyst's pre-execution size estimate for a query: the
    optimized logical plan's statistics (for parquet scans, file sizes
    after partition pruning — an upper bound on bytes the query can
    pull in). Driver-side only; nothing executes."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def admit_or_raise(df: DataFrame, max_input_bytes: int) -> DataFrame:
    """Admission control: reject a query whose estimated input exceeds
    the budget BEFORE any task runs — the failure mode Presto's
    query.max-memory gives (a clean 'exceeded memory limit' error),
    minus the mid-flight kill Spark's shared-JVM model can't express.
    Returns the DataFrame unchanged when admitted, so it composes:

        admit_or_raise(queries["q1"](spark, sf), cap).collect()
    """
    est = estimated_input_bytes(df)
    if est > max_input_bytes:
        raise QueryAdmissionError(
            f"query estimated input {est} bytes exceeds the admission "
            f"cap {max_input_bytes} (Presto analogue: 'Query exceeded "
            "per-node memory limit'); raise the cap, add filters, or "
            "run against a partition-pruned slice"
        )
    return df
