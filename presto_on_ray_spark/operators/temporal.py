"""Temporal operators: as-of join and hypertable-style cascade rollup.

The reference engine delegates SQL to a Presto JVM
(/root/reference/launcher.py:154-171), and Presto 0.248 has no ASOF
JOIN or continuous-aggregate surface — but any event/training-data
pipeline at 100 TB needs both (point-in-time feature lookup, tiered
time-series rollups). These are the Spark-first forms:

- ``join_asof``: for each purchase event, the most recent click by the
  same user at-or-before the purchase timestamp. NOT implemented as a
  range join (which Catalyst would plan as a broadcast-nested-loop or
  an exploding theta join): instead the classic union + running-window
  trick — tag both sides, union on the (user_id, ts) spine, and take
  ``last(click, ignorenulls=True)`` over an unbounded-preceding ROWS
  window. One hash shuffle on user_id, linear in input size, no
  pair explosion — the shape that survives a 100× scale-up.
- ``join_asof_tolerance``: same, with matches farther than a tolerance
  nulled out. The latest preceding click is by definition the nearest
  preceding click, so post-filtering the as-of result is exact.
- ``rollup_hypertable``: TimescaleDB-style continuous-aggregate
  cascade — hourly buckets aggregated from raw events, daily buckets
  aggregated FROM THE HOURLY ROLLUP (not from raw). The hourly sums
  stay DECIMAL through the cascade so the re-aggregation is exact and
  order-independent; only the final surface casts to double. At scale
  this is the tiered-storage pattern: the daily pass reads ~1/3600th
  of the raw bytes.

Determinism: the right side is deduplicated to one click per
(user_id, ts) via max_by(event_id) before the as-of pick, so the
match is unique on both engines; the DuckDB oracle applies the same
dedup CTE before its native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.suite import query

# Microseconds of allowed lookback for the tolerance variant (1 hour).
ASOF_TOLERANCE_US = 3_600_000_000


def _purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("p_value")
    )


def _clicks_deduped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One click per (user_id, ts): keep the max-event_id row's value.

    Plain groupBy — partial-aggregate friendly, shuffles (user_id, ts)
    pairs only. Makes the as-of pick unique (no timestamp ties on the
    right side), which is what lets both engines agree exactly.
    """
    ev = t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("click_value"))
    )


def asof_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """Union + running-window as-of join core (left columns:
    event_id/user_id/ts/p_value; right: user_id/ts/click_value with
    (user_id, ts) unique)."""
    tagged_left = left.select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        "event_id",
        "p_value",
        F.lit(None).cast("timestamp").alias("c_ts"),
        F.lit(None).cast("double").alias("c_val"),
    )
    tagged_right = right.select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("p_value"),
        F.col("ts").alias("c_ts"),
        F.col("click_value").alias("c_val"),
    )
    spine = tagged_left.unionByName(tagged_right)
    # side=0 sorts before side=1 at equal ts → "at-or-before" includes
    # a click at the exact purchase timestamp, matching ASOF's >=.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.withColumn("click_ts", F.last("c_ts", ignorenulls=True).over(w))
        .withColumn("click_value", F.last("c_val", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            "p_value",
            "click_ts",
            "click_value",
            (F.unix_micros("ts") - F.unix_micros("click_ts")).alias("gap_us"),
        )
    )


_ASOF_ORACLE = """
WITH clicks AS (
  SELECT user_id, ts, arg_max(value, event_id) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
), p AS (
  SELECT event_id, user_id, ts, value AS p_value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, p.p_value,
       c.ts AS click_ts, c.click_value,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@query("join_asof", oracle=_ASOF_ORACLE)
def join_asof(spark, sf_dir):
    """As-of join: latest same-user click at-or-before each purchase
    (left outer — purchases with no prior click keep NULL click
    columns). Oracle is DuckDB's native ASOF LEFT JOIN."""
    return asof_join(_purchases(spark, sf_dir), _clicks_deduped(spark, sf_dir))


@query(
    "join_asof_tolerance",
    oracle=f"""
    SELECT event_id, user_id, ts, p_value,
           CASE WHEN gap_us <= {ASOF_TOLERANCE_US} THEN click_ts END AS click_ts,
           CASE WHEN gap_us <= {ASOF_TOLERANCE_US} THEN click_value END AS click_value,
           CASE WHEN gap_us <= {ASOF_TOLERANCE_US} THEN gap_us END AS gap_us
    FROM ({_ASOF_ORACLE}) asof_base
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join with a 1-hour tolerance: a match farther back than
    the tolerance is treated as no match (kdb-style ``aj`` window /
    pandas ``merge_asof(tolerance=...)``). Exact as a post-filter
    because the latest preceding click is also the nearest."""
    res = join_asof(spark, sf_dir)
    within = F.col("gap_us") <= ASOF_TOLERANCE_US
    return res.select(
        "event_id",
        "user_id",
        "ts",
        "p_value",
        F.when(within, F.col("click_ts")).alias("click_ts"),
        F.when(within, F.col("click_value")).alias("click_value"),
        F.when(within, F.col("gap_us")).alias("gap_us"),
    )


def hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour × event_type rollup with DECIMAL partial sums (the cascade
    input; exact and re-aggregatable)."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_bucket"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(30,2)")).alias("hv"),
    )


@query(
    "rollup_hypertable",
    oracle="""
    WITH hourly AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_bucket, event_type,
             COUNT(*) AS n_events,
             SUM(CAST(value AS DECIMAL(30,2))) AS hv
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(time_bucket(INTERVAL '1 day', hour_bucket) AS TIMESTAMP) AS day_bucket,
           event_type,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           COUNT(*) AS n_hours,
           CAST(SUM(hv) AS DOUBLE) AS total_value,
           CAST(SUM(hv) AS DOUBLE) / COUNT(*) AS avg_hourly_value
    FROM hourly GROUP BY 1, 2
    """,
)
def rollup_hypertable(spark, sf_dir):
    """Continuous-aggregate cascade: daily buckets computed FROM the
    hourly rollup. Sums stay decimal across both tiers (exact), so the
    cascade result is bit-identical to a direct daily aggregation; the
    oracle mirrors the same two-tier CTE."""
    hourly = hourly_rollup(spark, sf_dir)
    return (
        hourly.groupBy(
            F.date_trunc("day", "hour_bucket").alias("day_bucket"), "event_type"
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.count("*").alias("n_hours"),
            F.sum("hv").alias("dv"),
        )
        .select(
            "day_bucket",
            "event_type",
            "n_events",
            "n_hours",
            F.col("dv").cast("double").alias("total_value"),
            (F.col("dv").cast("double") / F.col("n_hours")).alias("avg_hourly_value"),
        )
    )


# Microseconds of inactivity that closes a session (30 minutes).
SESSION_GAP_US = 1_800_000_000


@query(
    "sessionize_batch",
    oracle=f"""
    WITH e AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM e
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total_value,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
    FROM s GROUP BY 1, 2
    """,
)
def sessionize_batch(spark, sf_dir):
    """Gap-based sessionization, batch form with an EXACT oracle: mark
    a session boundary where the same-user gap exceeds 30 minutes
    (lag), number sessions with a running sum, aggregate per session.
    Semantically the twin of session_window/streaming sessionization
    (streaming/windows.py:83) — but lag+cumsum is plain SQL, so this
    query gives the session family a value-hash-checked row (DuckDB has
    no session_window). Single hash shuffle on user_id feeds both
    window passes AND the final (user_id, session_idx) aggregation —
    the aggregation key is a superset of the partitioning."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    marked = ev.withColumn(
        "new_s", F.when(gap > SESSION_GAP_US, 1).otherwise(0)
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.withColumn("session_idx", F.sum("new_s").over(run).cast("long"))
    return sess.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(30,2)")).cast("double").alias("total_value"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
    )


# Hour-boundary split for the incremental-refresh demo: rows before the
# split play the already-materialized tier, rows at/after it the delta.
ROLLUP_REFRESH_SPLIT = "2024-01-15 00:00:00"


@query(
    "rollup_incremental_refresh",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS hour_bucket,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def rollup_incremental_refresh(spark, sf_dir):
    """Incremental materialized-view refresh: merge an existing hourly
    rollup with partial aggregates over only the NEW rows, instead of
    recomputing from raw. The oracle is the full recompute — exact
    agreement (decimal partials are associative) IS the correctness
    proof of the refresh algebra.

    Shape at scale: the delta scan reads only the new partition(s); the
    merge is a groupBy over two rollup-sized inputs, never over raw
    history. At 100 TB with daily deltas this is the difference between
    re-reading 100 TB and reading one day's slice plus a rollup whose
    size is |hours × event_types|."""
    split = F.lit(ROLLUP_REFRESH_SPLIT).cast("timestamp")
    ev = t(spark, sf_dir, "events")

    def partials(df):
        return df.groupBy(
            F.date_trunc("hour", "ts").alias("hour_bucket"), "event_type"
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,2)")).alias("hv"),
        )

    base = partials(ev.filter(F.col("ts") < split))     # the stored MV
    delta = partials(ev.filter(F.col("ts") >= split))   # the new slice
    return (
        base.unionByName(delta)
        .groupBy("hour_bucket", "event_type")
        .agg(F.sum("n_events").alias("n_events"), F.sum("hv").alias("hv"))
        .select(
            "hour_bucket",
            "event_type",
            "n_events",
            F.col("hv").cast("double").alias("total_value"),
        )
    )
