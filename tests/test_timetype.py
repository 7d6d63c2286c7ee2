"""TIME / TIME WITH TIME ZONE (functions/timetype.py, SURVEY §1.2's
last type, closed r6): Spark 4.1's native TIME behind
spark.sql.timeType.enabled plus the engine's gap-fillers (timestamp
cast, wrap-around arithmetic, fixed rendering) and the tz-time struct.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from presto_on_ray_spark.engine import Engine
from presto_on_ray_spark.functions import timetype


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return Engine(spark).register_tables(sf_dir)


def one(eng, sql):
    return eng.sql(sql).collect()[0][0]


# -- native type through the SQL front door -----------------------------

def test_time_literal_native(eng):
    assert one(eng, "SELECT TIME '10:30:00.123'") == dt.time(10, 30, 0, 123000)


def test_time_cast_and_fields(eng):
    assert one(eng, "SELECT CAST('23:59:58' AS TIME)") == dt.time(23, 59, 58)
    row = eng.sql(
        "SELECT hour(TIME '10:30:45') AS h, minute(TIME '10:30:45') AS m,"
        " second(TIME '10:30:45') AS s,"
        " extract(HOUR FROM TIME '07:00:00') AS eh"
    ).collect()[0]
    assert (row.h, row.m, row.s, row.eh) == (10, 30, 45, 7)


def test_time_comparison_and_minmax(eng):
    assert one(eng, "SELECT TIME '09:00:00' < TIME '10:30:00'") is True
    assert one(
        eng,
        "SELECT min(t) FROM (VALUES (TIME '10:30:00'), (TIME '09:00:00')) v(t)",
    ) == dt.time(9, 0)


def test_time_literal_with_offset_is_struct(eng):
    row = one(eng, "SELECT TIME '10:30:00 +05:30'")
    assert row.t == dt.time(10, 30) and row.offset_minutes == 330
    row = one(eng, "SELECT TIME '08:15:30.250 -09:30'")
    assert row.t == dt.time(8, 15, 30, 250000) and row.offset_minutes == -570


def test_invalid_time_literal_errors_at_translate(eng):
    with pytest.raises(ValueError, match="invalid TIME literal"):
        eng.sql("SELECT TIME '25:00:00'")


def test_localtime_and_current_time(eng):
    v = one(eng, "SELECT localtime")
    assert isinstance(v, dt.time)
    row = one(eng, "SELECT current_time")
    assert isinstance(row.t, dt.time) and row.offset_minutes == 0


def test_timestamp_literals_untouched(eng):
    # TIME is a prefix of TIMESTAMP: the typed-literal rewrite must not
    # corrupt native TIMESTAMP literals
    assert one(eng, "SELECT TIMESTAMP '2020-01-02 10:30:00'") == dt.datetime(
        2020, 1, 2, 10, 30
    )


def test_presto_type_rendering():
    from pyspark.sql import types as T

    from presto_on_ray_spark.type_names import presto_type_name

    assert presto_type_name(T.TimeType()) == "time"
    tzt = T.StructType(
        [
            T.StructField("t", T.TimeType()),
            T.StructField("offset_minutes", T.IntegerType()),
        ]
    )
    assert presto_type_name(tzt) == "time with time zone"
    tstz = T.StructType(
        [
            T.StructField("instant", T.TimestampType()),
            T.StructField("tz", T.StringType()),
        ]
    )
    assert presto_type_name(tstz) == "timestamp with time zone"


# -- gap-filling helpers -------------------------------------------------

def _sel(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0][0]


def test_from_timestamp(spark):
    got = _sel(
        spark,
        timetype.from_timestamp(F.lit("2020-01-02 23:59:58.123456").cast("timestamp")),
    )
    assert got == dt.time(23, 59, 58, 123456)


def test_add_duration_wraps_midnight(spark):
    t23 = F.expr("TIME '23:00:00'")
    got = _sel(spark, timetype.add_duration(t23, 2 * 3600 * 1000))
    assert got == dt.time(1, 0)  # Presto: TIME '23:00' + 2h = 01:00
    # negative wrap via column millis
    got = _sel(spark, timetype.add_duration(F.expr("TIME '00:30:00'"), F.lit(-3600000)))
    assert got == dt.time(23, 30)


def test_format_time_fixed_millis(spark):
    assert _sel(spark, timetype.format_time(F.expr("TIME '07:05:03'"))) == "07:05:03.000"
    assert (
        _sel(spark, timetype.format_time(F.expr("TIME '23:59:58.1'")))
        == "23:59:58.100"
    )


def test_micros_round_trip(spark):
    t = F.expr("TIME '13:14:15.678901'")
    us = _sel(spark, timetype.to_micros(t))
    assert us == ((13 * 60 + 14) * 60 + 15) * 1_000_000 + 678901
    assert _sel(spark, timetype.from_micros(F.lit(us))) == dt.time(13, 14, 15, 678901)


def test_tztime_utc_normalization(spark):
    # 10:00 +05:30 and 04:30 +00:00 are the same instant
    a = timetype.time_with_timezone(F.expr("TIME '10:00:00'"), 330)
    b = timetype.time_with_timezone(F.expr("TIME '04:30:00'"), 0)
    assert _sel(spark, timetype.utc_micros(a)) == _sel(spark, timetype.utc_micros(b))


def test_tztime_at_offset_and_render(spark):
    a = timetype.time_with_timezone(F.expr("TIME '10:00:00'"), 0)
    moved = timetype.at_offset(a, 330)
    assert _sel(spark, timetype.format_tztime(moved)) == "15:30:00.000 +05:30"
    neg = timetype.at_offset(a, -570)
    assert _sel(spark, timetype.format_tztime(neg)) == "00:30:00.000 -09:30"


def test_parse_time_literal_unit():
    assert timetype.parse_time("10:30:00.123") == (37_800_123_000, None)
    assert timetype.parse_time("00:00:00 +05:30") == (0, 330)
    assert timetype.parse_time("12:00") == (12 * 3600 * 1_000_000, None)
    with pytest.raises(ValueError):
        timetype.parse_time("10:75:00")


def test_parquet_round_trip(spark, tmp_path):
    df = spark.sql("SELECT CAST('10:30:00.123456' AS TIME) AS t, 1 AS id")
    path = str(tmp_path / "t.parquet")
    df.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path).collect()
    assert back[0].t == dt.time(10, 30, 0, 123456)
