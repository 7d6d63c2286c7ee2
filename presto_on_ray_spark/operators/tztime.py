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

from presto_on_ray_spark.functions import tztype
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
