"""Query-suite registry.

Every operator implemented from SURVEY.md §2 registers here: a Spark
callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a
DuckDB oracle SQL string. ``__spark_entry__.py`` exposes this registry
to the driver's differential-correctness harness; keeping the oracle
adjacent to the implementation keeps semantics honest.

Determinism contract (this is what makes exact value-hash comparison
possible between Spark and DuckDB):
- double-typed SUM/AVG aggregate inputs are cast to DECIMAL before
  accumulation (exact, order-independent), then the result is cast back
  to double — both engines produce bit-identical values;
- every window/top-N ordering carries a unique tie-breaker key;
- no query depends on partition count or row order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a suite query; ``oracle=None`` → driver's rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run."""
    from presto_on_ray_spark.operators import (  # noqa: F401
        agg_extra,
        aggregates,
        arrays_extra,
        dedup,
        filters,
        grouped_pandas,
        joins,
        json_ops,
        multimodal,
        sampling,
        scalar_misc,
        setops,
        similarity,
        skew,
        sketch_ops,
        sorts,
        strings_dates,
        structural,
        textstats,
        tpch,
        windows,
    )
    from presto_on_ray_spark.streaming import windows as streaming_windows  # noqa: F401
