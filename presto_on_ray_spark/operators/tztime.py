"""TIMESTAMP WITH TIME ZONE operator surface (SURVEY §1.3 gap closed in
r5 — see functions/tztype.py for the type rendering and semantics).

The reference's users get this type through Presto 0.248's MySQL
catalog and the AT TIME ZONE operator; this suite query exercises the
full function family over the events fixture against a DuckDB ICU
oracle: instant→wall localization in DST and fixed-offset zones, field
extraction under a zone, zone re-attachment (AT TIME ZONE), Presto-
style rendering, and zone-independent epoch read-out.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_on_ray_spark.functions import timetype, tztype
from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.suite import query


@query(
    "tz_type_functions",
    oracle="""
    SELECT event_id,
           HOUR(timezone('Asia/Tokyo', tstz)) AS tokyo_hour,
           HOUR(timezone('America/New_York', tstz)) AS ny_hour,
           CAST(CAST(timezone('Asia/Kolkata', tstz) AS DATE) AS VARCHAR) AS kolkata_date,
           strftime(timezone('Asia/Tokyo', tstz), '%Y-%m-%d %H:%M:%S') || ' Asia/Tokyo' AS tokyo_render,
           CAST(epoch_us(tstz) AS DOUBLE) / 1000000.0 AS unix_s
    FROM (
      SELECT event_id, timezone('UTC', ts) AS tstz
      FROM events WHERE event_id <= 200
    )
    """,
)
def tz_type_functions(spark, sf_dir):
    """timestamp-with-time-zone family end-to-end: attach a zone to the
    stored UTC instant (the cast Presto performs reading a plain
    timestamp), AT TIME ZONE re-display in three zones (one with DST,
    one fixed-offset, one half-hour offset), wall-clock field
    extraction, rendering, and epoch seconds. Instant→wall is always
    well-defined (DST included); the ambiguous wall→instant direction
    (with_timezone) is covered by tests/test_tztype.py.

    Scale shape: pure per-row JVM intrinsics (from_utc_timestamp) — no
    shuffle, no state; the zone rules are JVM tzdata, identical on
    every executor."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") <= 200)
    v = tztype.from_instant(F.col("ts"), "UTC")
    tokyo = tztype.at_timezone(v, "Asia/Tokyo")
    ny = tztype.at_timezone(v, "America/New_York")
    kolkata = tztype.at_timezone(v, "Asia/Kolkata")
    return ev.select(
        "event_id",
        tztype.tz_hour(tokyo).alias("tokyo_hour"),
        tztype.tz_hour(ny).alias("ny_hour"),
        tztype.tz_date(kolkata).cast("string").alias("kolkata_date"),
        tztype.format_tz(tokyo).alias("tokyo_render"),
        tztype.to_unixtime(v).alias("unix_s"),
    )


@query(
    "time_type_functions",
    oracle="""
    WITH u AS (
      SELECT event_id, epoch_us(ts) % 86400000000 AS us
      FROM events WHERE event_id <= 200
    )
    SELECT event_id,
           CAST(us // 3600000000 AS INT) AS h,
           CAST((us // 60000000) % 60 AS INT) AS m,
           CAST((us // 1000000) % 60 AS INT) AS s,
           lpad(CAST(us // 3600000000 AS VARCHAR), 2, '0') || ':' ||
           lpad(CAST((us // 60000000) % 60 AS VARCHAR), 2, '0') || ':' ||
           lpad(CAST((us // 1000000) % 60 AS VARCHAR), 2, '0') || '.' ||
           lpad(CAST((us // 1000) % 1000 AS VARCHAR), 3, '0') AS rendered,
           lpad(CAST(((us + 82800000000) % 86400000000) // 3600000000 AS VARCHAR), 2, '0') || ':' ||
           lpad(CAST((((us + 82800000000) % 86400000000) // 60000000) % 60 AS VARCHAR), 2, '0') || ':' ||
           lpad(CAST((((us + 82800000000) % 86400000000) // 1000000) % 60 AS VARCHAR), 2, '0') || '.' ||
           lpad(CAST((((us + 82800000000) % 86400000000) // 1000) % 1000 AS VARCHAR), 3, '0') AS plus23h,
           us >= 43200000000 AS is_pm,
           lpad(CAST(((us + 19800000000) % 86400000000) // 3600000000 AS VARCHAR), 2, '0') || ':' ||
           lpad(CAST((((us + 19800000000) % 86400000000) // 60000000) % 60 AS VARCHAR), 2, '0') || ':' ||
           lpad(CAST((((us + 19800000000) % 86400000000) // 1000000) % 60 AS VARCHAR), 2, '0') || '.' ||
           lpad(CAST((((us + 19800000000) % 86400000000) // 1000) % 1000 AS VARCHAR), 3, '0') ||
           ' +05:30' AS kolkata_render
    FROM u
    """,
)
def time_type_functions(spark, sf_dir):
    """TIME / TIME WITH TIME ZONE end-to-end (SURVEY §1.2's last type,
    closed r6): CAST(timestamp AS TIME) (timetype.from_timestamp),
    native hour/minute/second field extraction, Presto's fixed
    'HH:MM:SS.mmm' rendering, wrap-around interval arithmetic
    (TIME '23:00' + 2h semantics — here +23h so every fixture row
    wraps or nearly wraps), native TIME-literal comparison, and the
    tz-time struct re-displayed at +05:30 with Presto's rendering.
    The oracle derives every output from integer micros-of-day —
    fully deterministic, no transcendental or float anywhere.

    Scale shape: pure per-row JVM intrinsics over the native TIME type
    (Spark 4.1, spark.sql.timeType.enabled) — no shuffle, no UDF; the
    plan is a single project over the pruned (event_id, ts) scan."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") <= 200)
    tt = timetype.from_timestamp(F.col("ts"))
    noon = F.expr("TIME '12:00:00'")
    kolkata = timetype.at_offset(timetype.time_with_timezone(tt, 0), 330)
    return ev.select(
        "event_id",
        F.hour(tt).alias("h"),
        F.minute(tt).alias("m"),
        F.second(tt).alias("s"),
        timetype.format_time(tt).alias("rendered"),
        timetype.format_time(
            timetype.add_duration(tt, 23 * 3600 * 1000)
        ).alias("plus23h"),
        (tt >= noon).alias("is_pm"),
        timetype.format_tztime(kolkata).alias("kolkata_render"),
    )
