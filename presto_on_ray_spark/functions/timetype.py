"""TIME / TIME WITH TIME ZONE (SURVEY §1.2 — the last Presto types
the engine lacked; closed in r6).

Presto 0.248 exposes `time` (a time of day, millisecond precision) and
`time with time zone` (a time of day plus a FIXED utc offset — without
a date, zone rules reduce to an offset). The reference's users hit
these through its MySQL catalog's TIME columns (reference
mysql.properties:1-4; type set pinned by presto-mgr.py:13).

Spark 4.1 ships a native TIME type behind ``spark.sql.timeType.enabled``
(set by session.apply_session_defaults / get_spark): the literal
``TIME '10:30:00'``, CAST(varchar AS TIME), hour/minute/second/extract,
make_time/to_time, comparisons/ordering/grouping/min/max, TIME-TIME
subtraction (→ interval), and parquet round-trips are all native and
codegen'd — so the engine uses the NATIVE type and this module only
fills Presto-semantics gaps Spark 4.1 leaves open:

- ``from_timestamp(ts)``   — CAST(timestamp AS TIME) (unsupported
  natively): time-of-day of an instant.
- ``add_duration(t, ms)``  — TIME + interval with Presto's wrap-around
  (TIME '23:00' + 2h = TIME '01:00'; Spark raises DATETIME_OVERFLOW).
- ``format_time(t)``       — Presto's fixed 'HH:MM:SS.mmm' rendering
  (Spark's CAST to string trims trailing zeros).
- ``to_micros``/``from_micros`` — exact integer micros-of-day bridge
  used by the above (date_part('SECOND') keeps the fraction exactly).

TIME WITH TIME ZONE has no Spark type at all; the standard struct
rendering is ``struct<t: time, offset_minutes: int>`` with helpers
mirroring tztype.py: attach/re-display offsets, UTC-normalized
ordering key, Presto 'HH:MM:SS.mmm +05:30' rendering. All pure
built-in integer expressions — no UDF anywhere — so both types work
in joins, windows, and aggregations on any executor count.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

MICROS_PER_SECOND = 1_000_000
MICROS_PER_MINUTE = 60 * MICROS_PER_SECOND
MICROS_PER_HOUR = 60 * MICROS_PER_MINUTE
MICROS_PER_DAY = 24 * MICROS_PER_HOUR

TZTIME_SCHEMA = "struct<t: time(6), offset_minutes: int>"

_TIME_FMT = "HH:mm:ss.SSSSSS"

_TIME_RE = re.compile(
    r"^\s*(\d{1,2}):(\d{2})(?::(\d{2})(?:\.(\d{1,6}))?)?"
    r"(?:\s*([+-])(\d{1,2}):(\d{2}))?\s*$"
)


def parse_time(text: str) -> tuple[int, int | None]:
    """Parse a Presto TIME literal body ('10:30:00.123 [+05:30]') to
    (micros_since_midnight, offset_minutes_or_None). Used by the
    dialect typed-literal rewrite; errors loudly on bad input like
    Presto's parser."""
    m = _TIME_RE.match(text)
    if not m:
        raise ValueError(f"invalid TIME literal: {text!r}")
    h, mi = int(m.group(1)), int(m.group(2))
    s = int(m.group(3) or 0)
    frac = (m.group(4) or "").ljust(6, "0")
    if h > 23 or mi > 59 or s > 59:
        raise ValueError(f"invalid TIME literal: {text!r}")
    micros = (
        h * MICROS_PER_HOUR + mi * MICROS_PER_MINUTE
        + s * MICROS_PER_SECOND + int(frac)
    )
    offset = None
    if m.group(5) is not None:
        offset = int(m.group(6)) * 60 + int(m.group(7))
        if m.group(5) == "-":
            offset = -offset
    return micros, offset


# -- native-TIME bridges ------------------------------------------------

def from_timestamp(ts: Column) -> Column:
    """Time-of-day of a timestamp (Presto CAST(timestamp AS TIME);
    Spark 4.1 doesn't support that cast yet). date_format + to_time
    keeps full microsecond precision, both JVM intrinsics."""
    return F.to_time(F.date_format(ts, _TIME_FMT), F.lit(_TIME_FMT))


def to_micros(t: Column) -> Column:
    """Exact integer micros-since-midnight of a TIME value.
    date_part('SECOND') returns DECIMAL(8,6) including the fraction, so
    the arithmetic is exact (no float)."""
    return (
        F.hour(t).cast("bigint") * MICROS_PER_HOUR
        + F.minute(t).cast("bigint") * MICROS_PER_MINUTE
        + (F.date_part(F.lit("SECOND"), t) * MICROS_PER_SECOND).cast("bigint")
    )


def from_micros(us: Column) -> Column:
    """micros-of-day -> TIME via make_time (seconds take a DECIMAL, so
    the fraction survives exactly)."""
    sec = (
        F.pmod(us, F.lit(MICROS_PER_MINUTE)).cast("decimal(20,0)")
        / MICROS_PER_SECOND
    ).cast("decimal(8,6)")
    return F.make_time(
        (us / MICROS_PER_HOUR).cast("int"),
        F.pmod((us / MICROS_PER_MINUTE).cast("bigint"), F.lit(60)).cast("int"),
        sec,
    )


def add_duration(t: Column, millis: Column | int) -> Column:
    """TIME + interval with Presto's wrap-around-midnight semantics
    (TIME '23:00' + INTERVAL '2' HOUR = TIME '01:00'; Spark's native
    TIME + INTERVAL raises DATETIME_OVERFLOW instead of wrapping)."""
    ms = F.lit(millis) if isinstance(millis, int) else millis
    return from_micros(
        F.pmod(to_micros(t) + ms.cast("bigint") * 1000, F.lit(MICROS_PER_DAY))
    )


def format_time(t: Column) -> Column:
    """Presto's fixed rendering 'HH:MM:SS.mmm' (CAST(time AS varchar)
    in Spark trims trailing zeros; Presto always prints 3 digits)."""
    millis = F.pmod((to_micros(t) / 1000).cast("bigint"), F.lit(1000))
    return F.concat_ws(
        ":",
        F.lpad(F.hour(t).cast("string"), 2, "0"),
        F.lpad(F.minute(t).cast("string"), 2, "0"),
        F.concat(
            F.lpad(F.second(t).cast("string"), 2, "0"),
            F.lit("."),
            F.lpad(millis.cast("string"), 3, "0"),
        ),
    )


# -- TIME WITH TIME ZONE (struct<t, offset_minutes>) --------------------

def time_with_timezone(t: Column, offset_minutes: Column | int) -> Column:
    """Attach a fixed UTC offset to a TIME value (Presto TIME WITH TIME
    ZONE; without a date a zone id reduces to its fixed offset)."""
    off = F.lit(offset_minutes) if isinstance(offset_minutes, int) else offset_minutes
    return F.struct(t.alias("t"), off.cast("int").alias("offset_minutes"))


def utc_micros(tv: Column) -> Column:
    """UTC-normalized micros-of-day — Presto compares/orders tz-times
    on this instant, wrapping around midnight."""
    return F.pmod(
        to_micros(tv["t"])
        - tv["offset_minutes"].cast("bigint") * MICROS_PER_MINUTE,
        F.lit(MICROS_PER_DAY),
    )


def at_offset(tv: Column, offset_minutes: Column | int) -> Column:
    """Same instant, new display offset (AT TIME ZONE on a tz-time)."""
    off = F.lit(offset_minutes) if isinstance(offset_minutes, int) else offset_minutes
    wall = F.pmod(
        utc_micros(tv) + off.cast("bigint") * MICROS_PER_MINUTE,
        F.lit(MICROS_PER_DAY),
    )
    return F.struct(
        from_micros(wall).alias("t"), off.cast("int").alias("offset_minutes")
    )


def format_tztime(tv: Column) -> Column:
    """Presto's rendering: 'HH:MM:SS.mmm +05:30'."""
    off = tv["offset_minutes"]
    sign = F.when(off < 0, F.lit("-")).otherwise(F.lit("+"))
    a = F.abs(off)
    return F.concat(
        format_time(tv["t"]),
        F.lit(" "),
        sign,
        F.lpad((a / 60).cast("int").cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad(F.pmod(a, F.lit(60)).cast("string"), 2, "0"),
    )
