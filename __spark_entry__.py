"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``presto_on_ray_spark``; every operator module
registers its queries + oracles in ``presto_on_ray_spark.suite``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from presto_on_ray_spark import suite  # noqa: E402

suite.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q1 shape (scan→filter→hash agg→sort) — the same lifecycle the
    reference delegates wholesale to Presto (SURVEY §3.1).
    """
    return suite.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.11."""
    return dict(suite.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted entries (approximate
    sketches, LSH candidates, sampling) get the driver's weaker
    rows-only check by design."""
    return dict(suite.ORACLES)
