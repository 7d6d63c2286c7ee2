"""timestamp-with-time-zone rendering (functions/tztype.py): instant
semantics, DST-correct localization, and the wall→instant direction."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from presto_on_ray_spark.functions import tztype


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_at_timezone_preserves_instant(spark):
    base = F.lit("2024-07-15 22:30:00").cast("timestamp")
    v = tztype.from_instant(base, "UTC")
    tokyo = tztype.at_timezone(v, "Asia/Tokyo")
    row = spark.range(1).select(
        v["instant"].alias("a"), tokyo["instant"].alias("b"),
        tztype.tz_hour(tokyo).alias("h"),
    ).collect()[0]
    assert row.a == row.b  # AT TIME ZONE never moves the instant
    assert row.h == 7  # 22:30 UTC = 07:30 next day in Tokyo


def test_dst_localization_winter_vs_summer(spark):
    winter = tztype.from_instant(F.lit("2024-01-15 12:00:00").cast("timestamp"), "UTC")
    summer = tztype.from_instant(F.lit("2024-07-15 12:00:00").cast("timestamp"), "UTC")
    ny_w = tztype.tz_hour(tztype.at_timezone(winter, "America/New_York"))
    ny_s = tztype.tz_hour(tztype.at_timezone(summer, "America/New_York"))
    row = spark.range(1).select(ny_w.alias("w"), ny_s.alias("s")).collect()[0]
    assert (row.w, row.s) == (7, 8)  # EST -5 vs EDT -4


def test_with_timezone_roundtrip_fixed_offset(spark):
    """wall→instant→wall round-trips exactly in zones without DST (the
    only direction DST can make ambiguous; Presto has the same edge)."""
    wall = F.lit("2024-03-10 02:30:00").cast("timestamp")  # DST-gap wall time in the US
    v = tztype.with_timezone(wall, "Asia/Kolkata")
    back = tztype.localize(v)
    row = spark.range(1).select(wall.alias("a"), back.alias("b"), v["instant"].alias("i")).collect()[0]
    assert row.a == row.b
    # +05:30: instant is 5h30m earlier than the wall clock
    assert row.i == row.a - datetime.timedelta(hours=5, minutes=30)


def test_ordering_and_unixtime_are_zone_independent(spark):
    t1 = tztype.with_timezone(F.lit("2024-07-15 09:00:00").cast("timestamp"), "Asia/Tokyo")
    t2 = tztype.with_timezone(F.lit("2024-07-15 01:00:00").cast("timestamp"), "UTC")
    row = spark.range(1).select(
        (t1["instant"] < t2["instant"]).alias("lt"),
        (tztype.to_unixtime(t1) - tztype.to_unixtime(t2)).alias("delta"),
    ).collect()[0]
    assert row.lt is True  # 09:00 Tokyo = 00:00 UTC < 01:00 UTC
    assert row.delta == -3600.0


def test_parquet_roundtrip_of_tz_struct(spark, tmp_path):
    """The struct rendering persists like any column — the property
    Presto users need for tz-typed table columns."""
    df = spark.range(3).select(
        tztype.with_timezone(
            F.lit("2024-07-15 10:00:00").cast("timestamp"), "Asia/Tokyo"
        ).alias("tstz")
    )
    p = str(tmp_path / "tz.parquet")
    df.write.parquet(p)
    back = spark.read.parquet(p)
    assert back.schema["tstz"].dataType.simpleString() == "struct<instant:timestamp,tz:string>"
    got = back.select(tztype.format_tz(F.col("tstz")).alias("r")).collect()
    assert {r.r for r in got} == {"2024-07-15 10:00:00 Asia/Tokyo"}
