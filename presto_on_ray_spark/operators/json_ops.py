"""JSON functions (SURVEY §2.8 JSON family) over events.props."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.suite import query


@query(
    "json_extract_ops",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_num,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_valid(props) AS BOOLEAN) AS is_valid
    FROM events WHERE event_id <= 200
    """,
)
def json_extract_ops(spark, sf_dir):
    """json_extract / json_extract_scalar (Presto) → get_json_object
    (JSONPath) with numeric + string extraction."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") <= 200)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_num"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$").isNotNull().alias("is_valid"),
    )


@query(
    "json_schema_parse",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS total_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def json_schema_parse(spark, sf_dir):
    """cast(varchar AS json) + typed access (Presto) → from_json with an
    explicit schema, then aggregate over the parsed field — the
    schema-on-read path a 100 TB pipeline should prefer over repeated
    get_json_object calls (parse once, prune columns)."""
    e = t(spark, sf_dir, "events")
    schema = StructType([StructField("k", LongType())])
    return (
        e.select("event_type", F.from_json("props", schema).alias("p"))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("p.k")).cast("long").alias("total_k"),
            F.count("*").alias("n"),
        )
    )
