"""Grouped-map / grouped-agg pandas operators (SURVEY §2.10).

The reference's only extensibility is Java plugins; Spark's pandas UDF
surface is strictly richer. These operators demonstrate the two grouped
shapes with *deterministic* semantics so they remain oracle-checkable:

- applyInPandas (grouped map): per-group z-score normalization — each
  group is one Arrow batch in pandas;
- pandas_udf grouped agg: decimal-free exact aggregation done in numpy
  int space.

Scale note: a group must fit in one executor's memory — fine for
per-customer/per-status groups; for giant groups pre-aggregate first.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.suite import query

_Z_SCHEMA = StructType(
    [
        StructField("o_orderstatus", StringType()),
        StructField("o_orderkey", LongType()),
        StructField("zscore", DoubleType()),
    ]
)


@query(
    "grouped_pandas_zscore",
    oracle="""
    SELECT o_orderstatus, o_orderkey,
           ROUND((o_totalprice - avg_p) / std_p, 4) AS zscore
    FROM (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             AVG(o_totalprice) OVER (PARTITION BY o_orderstatus) AS avg_p,
             STDDEV_SAMP(o_totalprice) OVER (PARTITION BY o_orderstatus) AS std_p
      FROM orders
    )
    WHERE o_orderkey <= 1000
    """,
)
def grouped_pandas_zscore(spark, sf_dir):
    """applyInPandas grouped map: z-score of order value within its
    status group. The oracle recomputes via window functions — pandas'
    ddof=1 std matches STDDEV_SAMP; rounding absorbs the last-ulp
    difference between pandas and SQL accumulation."""
    o = t(spark, sf_dir, "orders")

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf["o_totalprice"].mean()
        std = pdf["o_totalprice"].std(ddof=1)
        return pd.DataFrame(
            {
                "o_orderstatus": pdf["o_orderstatus"],
                "o_orderkey": pdf["o_orderkey"],
                "zscore": ((pdf["o_totalprice"] - mean) / std).round(4),
            }
        )

    return (
        o.groupBy("o_orderstatus")
        .applyInPandas(normalize, schema=_Z_SCHEMA)
        .filter(F.col("o_orderkey") <= 1000)
    )


@query(
    "grouped_pandas_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS total_rounded
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def grouped_pandas_agg(spark, sf_dir):
    """pandas_udf grouped aggregate: exact integer-space sum in numpy
    (floor-to-int first makes the arithmetic order-free and avoids the
    numpy-half-even vs SQL-half-away rounding trap, so the Arrow-batch
    aggregation matches SQL exactly)."""
    o = t(spark, sf_dir, "orders")

    @F.pandas_udf(LongType())
    def int_sum(prices: pd.Series) -> int:
        import numpy as np

        return int(np.floor(prices).astype("int64").sum())

    return o.groupBy("o_orderpriority").agg(
        int_sum("o_totalprice").alias("total_rounded")
    )
