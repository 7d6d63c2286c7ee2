"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.9/§2.10: the Spark-side mechanism for operators the engine
lacks natively — the reference has no streaming at all).

Running per-key totals: for each event_type, maintain (count, sum)
across micro-batches and emit the updated running state each batch.
State is two numbers per key — bounded regardless of stream length.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("running_count", LongType()),
        StructField("running_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("count", LongType()), StructField("value_sum", DoubleType())]
)


def _update(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (count, value_sum) = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        count += len(pdf)
        value_sum += float(pdf["value"].sum())
    state.update((count, value_sum))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "running_count": [count],
            "running_value": [round(value_sum, 2)],
        }
    )


def running_totals_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-type running totals with explicit keyed state."""
    from presto_on_ray_spark.streaming.windows import _events_stream

    ev = _events_stream(spark, sf_dir)
    return (
        ev.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_totals_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-input twin: the final state equals a plain aggregate."""
    from presto_on_ray_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("running_count"),
        F.round(
            F.sum(F.col("value").cast("decimal(30,2)")).cast("double"), 2
        ).alias("running_value"),
    )
