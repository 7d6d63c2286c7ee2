"""Statistical / geo / binary scalar tail (SURVEY §2.8 — Presto 0.248
math function family members not covered by direct Spark renames).

Expression-first: wilson intervals, great-circle distance, millisecond,
and year_of_week are pure built-in expressions (codegen'd, no Python in
the hot path). Only the normal-distribution pair crosses to Python —
erf/inv_cdf have no Spark builtin — and those ride Arrow-batched
pandas_udfs over the stdlib (math.erf, statistics.NormalDist), the
same tier as every other shim in registry.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


# Presto's great_circle_distance uses this radius (km).
_EARTH_RADIUS_KM = 6371.01


def great_circle_distance(lat1, lon1, lat2, lon2) -> Column:
    """Presto great_circle_distance(lat1, lon1, lat2, lon2) → km,
    haversine on a 6371.01 km sphere. Pure trig expressions."""
    la1, lo1, la2, lo2 = (F.radians(_c(v)) for v in (lat1, lon1, lat2, lon2))
    a = (
        F.pow(F.sin((la2 - la1) / 2), 2)
        + F.cos(la1) * F.cos(la2) * F.pow(F.sin((lo2 - lo1) / 2), 2)
    )
    return F.lit(2.0 * _EARTH_RADIUS_KM) * F.asin(F.least(F.sqrt(a), F.lit(1.0)))


def _wilson_bound(successes, trials, z, upper: bool) -> Column:
    s, n, zz = _c(successes).cast("double"), _c(trials).cast("double"), _c(z).cast("double")
    p = s / n
    z2 = zz * zz
    center = p + z2 / (2 * n)
    spread = zz * F.sqrt((p * (1 - p) + z2 / (4 * n)) / n)
    denom = 1 + z2 / n
    return (center + spread) / denom if upper else (center - spread) / denom


def wilson_interval_lower(successes, trials, z) -> Column:
    """Presto wilson_interval_lower(successes, trials, z): lower bound
    of the Wilson score interval for a Bernoulli proportion."""
    return _wilson_bound(successes, trials, z, upper=False)


def wilson_interval_upper(successes, trials, z) -> Column:
    """Presto wilson_interval_upper — upper Wilson bound."""
    return _wilson_bound(successes, trials, z, upper=True)


def millisecond(ts) -> Column:
    """Presto millisecond(timestamp): the ms-of-second field."""
    return (F.pmod(F.unix_micros(_c(ts)), F.lit(1_000_000)) / 1000).cast("int")


def year_of_week(ts) -> Column:
    """Presto year_of_week / yow: the ISO week-year (Jan 1 can belong
    to the previous ISO year). Identity: the ISO week-year of d is the
    calendar year of the THURSDAY in d's ISO week (weeks start Monday)
    — pure date arithmetic, no extract needed."""
    d = F.to_date(_c(ts))
    # ISO day-of-week Mon=1..Sun=7 from Spark's Sun=1..Sat=7
    iso_dow = F.pmod(F.dayofweek(d) + 5, F.lit(7)) + 1
    thursday = F.date_add(d, (F.lit(4) - iso_dow).cast("int"))
    return F.year(thursday)


def parse_duration_seconds(s) -> Column:
    """Presto parse_duration('2.5m') rendered as DOUBLE seconds (the
    interval value's magnitude; compose with make_dt_interval for an
    interval type). Units: ns, us, ms, s, m, h, d."""
    c = _c(s)
    num = F.regexp_extract(c, r"^\s*([0-9]*\.?[0-9]+)\s*(ns|us|ms|s|m|h|d)\s*$", 1).cast("double")
    unit = F.regexp_extract(c, r"^\s*([0-9]*\.?[0-9]+)\s*(ns|us|ms|s|m|h|d)\s*$", 2)
    factor = (
        F.when(unit == "ns", 1e-9)
        .when(unit == "us", 1e-6)
        .when(unit == "ms", 1e-3)
        .when(unit == "s", 1.0)
        .when(unit == "m", 60.0)
        .when(unit == "h", 3600.0)
        .when(unit == "d", 86400.0)
    )
    return num * factor


def _normal_cdf_series(mean: pd.Series, sd: pd.Series, v: pd.Series) -> pd.Series:
    import math

    # SQL decimal literals arrive as Decimal objects — coerce first
    mean, sd, v = (pd.to_numeric(c, errors="coerce") for c in (mean, sd, v))
    return pd.Series(
        [
            None
            if pd.isna(m) or pd.isna(s) or pd.isna(x)
            else 0.5 * (1.0 + math.erf((x - m) / (s * math.sqrt(2.0))))
            for m, s, x in zip(mean, sd, v)
        ],
        dtype="float64",
        index=mean.index,
    )


def _inverse_normal_cdf_series(mean: pd.Series, sd: pd.Series, p: pd.Series) -> pd.Series:
    from statistics import NormalDist

    mean, sd, p = (pd.to_numeric(c, errors="coerce") for c in (mean, sd, p))
    return pd.Series(
        [
            None
            if pd.isna(m) or pd.isna(s) or pd.isna(q)
            else NormalDist(mu=m, sigma=s).inv_cdf(q)
            for m, s, q in zip(mean, sd, p)
        ],
        dtype="float64",
        index=mean.index,
    )


def _from_big_endian_64_series(b: pd.Series) -> pd.Series:
    import struct

    return b.map(lambda v: struct.unpack(">q", v)[0], na_action="ignore")


def register_statistical_functions(spark) -> None:
    """SQL-name registration for the Python-tier members (the
    expression members are importable helpers, consistent with
    is_finite / cosine_similarity_arrays in registry.py)."""
    spark.udf.register("normal_cdf", pandas_udf(_normal_cdf_series, "double"))
    spark.udf.register(
        "inverse_normal_cdf", pandas_udf(_inverse_normal_cdf_series, "double")
    )
    spark.udf.register(
        "from_big_endian_64", pandas_udf(_from_big_endian_64_series, "bigint")
    )
