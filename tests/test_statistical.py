"""Statistical/geo/binary scalar tail (functions/statistical.py):
stdlib-reference pinning for the Python-tier members and semantics
checks for the expression members."""

from __future__ import annotations

import datetime
import math
from statistics import NormalDist

from pyspark.sql import functions as F

from presto_on_ray_spark.functions import statistical as S


def test_normal_cdf_matches_stdlib(spark):
    from presto_on_ray_spark.functions.registry import register_presto_functions

    register_presto_functions(spark)
    rows = spark.sql(
        "SELECT normal_cdf(0.0, 1.0, 1.96) AS a, normal_cdf(10.0, 2.0, 10.0) AS b, "
        "inverse_normal_cdf(0.0, 1.0, 0.975) AS c, normal_cdf(0.0, 1.0, CAST(NULL AS DOUBLE)) AS n"
    ).collect()[0]
    assert abs(rows.a - NormalDist().cdf(1.96)) < 1e-12
    assert abs(rows.b - 0.5) < 1e-12
    assert abs(rows.c - NormalDist().inv_cdf(0.975)) < 1e-9
    assert rows.n is None


def test_big_endian_roundtrip(spark):
    from presto_on_ray_spark.functions.registry import register_presto_functions

    register_presto_functions(spark)
    rows = spark.sql(
        "SELECT from_big_endian_64(to_big_endian_64(x)) AS r FROM VALUES (255), (-1), (0) AS t(x)"
    ).collect()
    assert [r.r for r in rows] == [255, -1, 0]


def test_year_of_week_iso_semantics(spark):
    """Jan 1 belonging to the previous ISO year — the case plain YEAR
    gets wrong — plus a sweep pinned to Python's isocalendar."""
    dates = ["2021-01-01", "2021-01-04", "2020-12-31", "2024-12-30", "2016-01-03", "2015-12-28"]
    df = spark.createDataFrame([(d,) for d in dates], ["d"]).select(
        "d", S.year_of_week(F.col("d").cast("date")).alias("yow")
    )
    got = {r.d: r.yow for r in df.collect()}
    for d in dates:
        expected = datetime.date.fromisoformat(d).isocalendar()[0]
        assert got[d] == expected, (d, got[d], expected)


def test_wilson_interval_formula(spark):
    row = spark.range(1).select(
        S.wilson_interval_lower(F.lit(20.0), F.lit(100.0), F.lit(1.96)).alias("lo"),
        S.wilson_interval_upper(F.lit(20.0), F.lit(100.0), F.lit(1.96)).alias("hi"),
    ).collect()[0]
    # reference: the same closed form evaluated in Python
    p, n, z = 0.2, 100.0, 1.96
    z2 = z * z
    center, denom = p + z2 / (2 * n), 1 + z2 / n
    spread = z * math.sqrt((p * (1 - p) + z2 / (4 * n)) / n)
    assert abs(row.lo - (center - spread) / denom) < 1e-12
    assert abs(row.hi - (center + spread) / denom) < 1e-12
    assert row.lo < 0.2 < row.hi


def test_great_circle_known_distance(spark):
    # Berlin (52.5200, 13.4050) to Paris (48.8566, 2.3522): ~878 km
    row = spark.range(1).select(
        S.great_circle_distance(
            F.lit(52.52), F.lit(13.405), F.lit(48.8566), F.lit(2.3522)
        ).alias("km")
    ).collect()[0]
    assert 870 < row.km < 890
    # zero distance, antipodal cap at pi*R
    row2 = spark.range(1).select(
        S.great_circle_distance(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(0.0)).alias("z"),
        S.great_circle_distance(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(180.0)).alias("anti"),
    ).collect()[0]
    assert row2.z == 0.0
    assert abs(row2.anti - math.pi * 6371.01) < 0.01


def test_parse_duration_units(spark):
    rows = spark.createDataFrame(
        [("2.5m",), ("1500ms",), ("1h",), ("0.5d",), ("250us",)], ["s"]
    ).select("s", S.parse_duration_seconds(F.col("s")).alias("sec")).collect()
    got = {r.s: r.sec for r in rows}
    assert got["2.5m"] == 150.0
    assert got["1500ms"] == 1.5
    assert got["1h"] == 3600.0
    assert got["0.5d"] == 43200.0
    assert abs(got["250us"] - 0.00025) < 1e-12


def test_millisecond_and_tz_offsets(spark):
    from presto_on_ray_spark.functions import tztype

    ts = F.lit("2024-07-15 10:00:30.123").cast("timestamp")
    ny = tztype.with_timezone(F.lit("2024-07-15 10:00:00").cast("timestamp"), "America/New_York")
    kol = tztype.with_timezone(F.lit("2024-07-15 10:00:00").cast("timestamp"), "Asia/Kolkata")
    row = spark.range(1).select(
        S.millisecond(ts).alias("ms"),
        tztype.timezone_hour(ny).alias("ny_h"),
        tztype.timezone_minute(ny).alias("ny_m"),
        tztype.timezone_hour(kol).alias("k_h"),
        tztype.timezone_minute(kol).alias("k_m"),
    ).collect()[0]
    assert row.ms == 123
    assert (row.ny_h, row.ny_m) == (-4, 0)  # EDT in July
    assert (row.k_h, row.k_m) == (5, 30)


def test_statistical_dialect_spellings(spark):
    """The SQL surface matches the Python helpers (dialect inlining)."""
    from presto_on_ray_spark.dialect import translate

    row = spark.sql(translate(
        "SELECT year_of_week(DATE '2021-01-01') AS yw, yow(DATE '2021-01-04') AS yw2, "
        "millisecond(TIMESTAMP '2024-07-15 10:00:30.123') AS ms, "
        "great_circle_distance(52.52, 13.405, 48.8566, 2.3522) AS km, "
        "wilson_interval_lower(20, 100.0, 1.96) AS lo, "
        "wilson_interval_upper(20, 100.0, 1.96) AS hi"
    )).collect()[0]
    assert row.yw == 2020 and row.yw2 == 2021
    assert row.ms == 123
    assert 870 < row.km < 890
    assert row.lo < 0.2 < row.hi


def test_day_of_week_iso_semantics(spark):
    """Presto day_of_week is ISO Mon=1..Sun=7 (the r5 fix: the old
    rename to Spark's dayofweek was Sun=1 — off by one)."""
    from presto_on_ray_spark.dialect import translate

    # 2024-07-15 is a Monday, 2024-07-21 a Sunday
    row = spark.sql(translate(
        "SELECT day_of_week(DATE '2024-07-15') AS mon, dow(DATE '2024-07-21') AS sun"
    )).collect()[0]
    assert (row.mon, row.sun) == (1, 7)
