"""MySQL-pattern datetime formatting/parsing (Presto ``date_format`` /
``date_parse`` semantics).

Presto's date_format/date_parse take MySQL format strings
(SURVEY §2.8 "MySQL patterns!"), while Spark's date_format takes Java
patterns — a silent-wrong-answer trap. We translate MySQL patterns to
Python strftime (a near-superset) and execute as Arrow-batched pandas
UDFs; not hot-path functions, and each batch with a constant pattern
vectorizes through ``Series.dt.strftime``.
"""

from __future__ import annotations

import pandas as pd

# MySQL format specifier -> python strftime specifier.
_MYSQL_TO_STRFTIME = {
    "%Y": "%Y",  # 4-digit year
    "%y": "%y",
    "%M": "%B",  # full month name
    "%b": "%b",  # abbreviated month name
    "%m": "%m",
    "%c": "%-m",  # month, no leading zero
    "%d": "%d",
    "%e": "%-d",  # day, no leading zero
    "%j": "%j",  # day of year
    "%H": "%H",
    "%k": "%-H",
    "%h": "%I",
    "%I": "%I",
    "%l": "%-I",
    "%i": "%M",  # minutes (the classic MySQL gotcha)
    "%S": "%S",
    "%s": "%S",
    "%f": "%f",  # microseconds
    "%p": "%p",
    "%r": "%I:%M:%S %p",
    "%T": "%H:%M:%S",
    "%W": "%A",  # weekday name
    "%a": "%a",
    "%w": "%w",
    "%%": "%%",
}


def translate_mysql_pattern(pattern: str) -> str:
    """Translate a MySQL format string to python strftime."""
    out: list[str] = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "%" and i + 1 < len(pattern):
            spec = pattern[i : i + 2]
            if spec not in _MYSQL_TO_STRFTIME:
                # fail loudly: silently emitting the bare letter would be
                # exactly the wrong-answer trap this module exists to close
                raise ValueError(f"unsupported MySQL datetime specifier {spec!r}")
            out.append(_MYSQL_TO_STRFTIME[spec])
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def format_series(ts: pd.Series, patterns: pd.Series) -> pd.Series:
    """Vectorized date_format: one strftime call per distinct pattern.

    Presto coerces DATE to TIMESTAMP implicitly for date_format; a DATE
    column reaches the Arrow batch as object-dtype ``datetime.date``
    values, where ``.dt`` would raise — normalize to datetime64 first.
    """
    if not pd.api.types.is_datetime64_any_dtype(ts):
        ts = pd.to_datetime(ts, errors="coerce")
    result = pd.Series(index=ts.index, dtype="object")
    for pat in patterns.dropna().unique():
        mask = patterns == pat
        result[mask] = ts[mask].dt.strftime(translate_mysql_pattern(pat))
    result[ts.isna() | patterns.isna()] = None
    return result


def parse_series(text: pd.Series, patterns: pd.Series) -> pd.Series:
    """Vectorized date_parse: MySQL pattern -> timestamp."""
    result = pd.Series(index=text.index, dtype="datetime64[us]")
    for pat in patterns.dropna().unique():
        mask = patterns == pat
        result[mask] = pd.to_datetime(
            text[mask], format=translate_mysql_pattern(pat), errors="coerce"
        )
    result[text.isna() | patterns.isna()] = None
    return result
