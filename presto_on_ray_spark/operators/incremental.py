"""Incremental / change-data-capture operators: MERGE upsert, SCD
Type 2 history, changelog compaction.

The reference engine delegates SQL to a Presto JVM
(/root/reference/launcher.py:154-171); Presto 0.248 has no MERGE
statement (that arrived in later Trino), but every warehouse fed by a
CDC stream needs these three shapes, and at 100 TB they are the daily
drivers of a training-data corpus that updates incrementally:

- ``merge_upsert``: MERGE INTO target USING source ON key
  WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN INSERT, expressed as
  ONE full-outer shuffle join on the key (the exact plan engines with a
  native MERGE produce). Matched rows add the source delta to the
  balance; source-only keys insert new rows; target-only rows pass
  through. With a bucketed target the join is co-located and the
  rewrite touches only the buckets holding changed keys.
- ``scd2_history``: build a Type-2 slowly-changing dimension from the
  events change stream — collapse consecutive duplicate states, then
  version each run with valid_from / valid_to / is_current via
  lag + lead windows. One hash shuffle on the key feeds every window
  pass (same partitioning reused across lag, filter, lead, version).
- ``cdc_latest_state``: compact a changelog to its latest row per key
  (the Debezium snapshot-read): row_number over (key ORDER BY ts DESC)
  = 1. Spark plans the rank filter as WindowGroupLimit, pruning
  per-partition before the final sort — no full materialization of
  history per key.

Determinism: the events stream is first deduplicated to one change per
(user_id, ts) by max event_id (same convention as temporal.py's as-of
right side), so window orderings are total on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from presto_on_ray_spark.functions.numeric import oracle_dsum
from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.suite import query


def _changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One state-change row per (user_id, ts): the max-event_id event
    wins ties, making every downstream window ordering total.

    Explicitly partitioned by user_id BEFORE the (user_id, ts) groupBy:
    a hash partitioning on a subset of the grouping keys satisfies the
    aggregation's clustering requirement AND the downstream windows'
    user_id partitioning — so the dedup and every window pass share ONE
    Exchange (verified: plan has a single shuffle)."""
    ev = t(spark, sf_dir, "events")
    return ev.repartition("user_id").groupBy("user_id", "ts").agg(
        F.max_by("event_type", "event_id").alias("state"),
        F.max("event_id").alias("event_id"),
    )


_MERGE_ORACLE = f"""
WITH target AS (
  SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 3 <> 0
), source AS (
  SELECT o_custkey AS c_custkey, {oracle_dsum('o_totalprice')} AS delta
  FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
  GROUP BY o_custkey
)
SELECT COALESCE(tg.c_custkey, s.c_custkey) AS c_custkey,
       CASE WHEN tg.c_custkey IS NOT NULL THEN tg.c_name
            ELSE 'Customer#new#' || CAST(s.c_custkey AS VARCHAR) END AS c_name,
       CASE WHEN tg.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
              THEN tg.c_acctbal + s.delta
            WHEN tg.c_custkey IS NOT NULL THEN tg.c_acctbal
            ELSE s.delta END AS c_acctbal,
       CASE WHEN tg.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
              THEN 'update'
            WHEN tg.c_custkey IS NOT NULL THEN 'keep'
            ELSE 'insert' END AS action
FROM target tg FULL OUTER JOIN source s ON tg.c_custkey = s.c_custkey
"""


@query("merge_upsert", oracle=_MERGE_ORACLE)
def merge_upsert(spark, sf_dir):
    """MERGE INTO as one full-outer join: target = customers whose key
    is not divisible by 3 (so ~1/3 of order keys arrive as inserts),
    source = per-customer deltas from RECENT orders only (customers
    with no recent orders pass through as 'keep'). The delta aggregate
    is decimal-exact; the single double addition on matched rows is the
    same two operands on both engines."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    target = c.filter(F.col("c_custkey") % 3 != 0).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    source = o.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    ).groupBy(F.col("o_custkey").alias("s_custkey")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast("double").alias("delta")
    )
    j = target.join(
        source, target["c_custkey"] == source["s_custkey"], "full_outer"
    )
    matched = target["c_custkey"].isNotNull() & source["s_custkey"].isNotNull()
    target_only = target["c_custkey"].isNotNull() & source["s_custkey"].isNull()
    return j.select(
        F.coalesce(target["c_custkey"], source["s_custkey"]).alias("c_custkey"),
        F.when(target["c_custkey"].isNotNull(), target["c_name"])
        .otherwise(F.concat(F.lit("Customer#new#"), source["s_custkey"].cast("string")))
        .alias("c_name"),
        F.when(matched, target["c_acctbal"] + F.col("delta"))
        .when(target_only, target["c_acctbal"])
        .otherwise(F.col("delta"))
        .alias("c_acctbal"),
        F.when(matched, F.lit("update"))
        .when(target_only, F.lit("keep"))
        .otherwise(F.lit("insert"))
        .alias("action"),
    )


_SCD2_ORACLE = """
WITH changes AS (
  SELECT user_id, ts, arg_max(event_type, event_id) AS state
  FROM events GROUP BY user_id, ts
), runs AS (
  SELECT user_id, ts, state,
         LAG(state) OVER (PARTITION BY user_id ORDER BY ts) AS prev_state
  FROM changes
), starts AS (
  SELECT user_id, ts, state FROM runs
  WHERE prev_state IS NULL OR state <> prev_state
)
SELECT user_id, state,
       ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT)
         AS version,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL AS is_current
FROM starts
"""


@query("scd2_history", oracle=_SCD2_ORACLE)
def scd2_history(spark, sf_dir):
    """Type-2 SCD build from a change stream: collapse consecutive
    duplicate states (a no-op change opens no new version), then stamp
    each run with valid_from/valid_to/version/is_current. All four
    window passes share one hash partitioning on user_id — Catalyst
    plans a single Exchange feeding chained Window nodes."""
    changes = _changes(spark, sf_dir).select("user_id", "ts", "state")
    w_ord = Window.partitionBy("user_id").orderBy("ts")
    starts = (
        changes.withColumn("prev_state", F.lag("state").over(w_ord))
        .filter(F.col("prev_state").isNull() | (F.col("state") != F.col("prev_state")))
        .drop("prev_state")
    )
    return starts.select(
        "user_id",
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w_ord).alias("valid_to"),
        F.row_number().over(w_ord).cast("long").alias("version"),
        F.lead("ts").over(w_ord).isNull().alias("is_current"),
    )


_CDC_LATEST_ORACLE = """
WITH changes AS (
  SELECT user_id, ts, arg_max(event_type, event_id) AS state,
         arg_max(value, event_id) AS value
  FROM events GROUP BY user_id, ts
), ranked AS (
  SELECT user_id, ts, state, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
  FROM changes
)
SELECT user_id, ts AS latest_ts, state AS latest_state, value AS latest_value
FROM ranked WHERE rn = 1
"""


@query("cdc_latest_state", oracle=_CDC_LATEST_ORACLE)
def cdc_latest_state(spark, sf_dir):
    """Changelog → snapshot compaction: the newest change per key.
    rank-1 filter plans as WindowGroupLimit (per-partition pruning
    before the exchange), so state per key is O(1) at any history
    depth."""
    ev = t(spark, sf_dir, "events")
    # user_id partitioning serves both the dedup groupBy and the
    # ranking window — one Exchange (see _changes).
    changes = ev.repartition("user_id").groupBy("user_id", "ts").agg(
        F.max_by("event_type", "event_id").alias("state"),
        F.max_by("value", "event_id").alias("value"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc())
    return (
        changes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("latest_ts"),
            F.col("state").alias("latest_state"),
            F.col("value").alias("latest_value"),
        )
    )
