"""Deterministic numeric aggregation helpers.

Floating-point SUM is order-dependent; a distributed partial/final
aggregation (Spark) and a single-threaded scan (the DuckDB oracle) can
differ in the last ulps. The engine's convention for money-like doubles:
accumulate in DECIMAL (exact, associative, order-independent), surface
as double. Matches what Presto does for its DECIMAL type semantics
(SURVEY §1.2) and makes cross-engine value hashes reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2, precision: int = 30) -> Column:
    """Exact sum of a double column via decimal accumulation → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 30) -> Column:
    """Deterministic average: exact decimal sum, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")
        / F.count(c)
    )


# DuckDB-side equivalents (kept adjacent so both sides stay in sync):
#   dsum(x)  ->  CAST(SUM(CAST(x AS DECIMAL(30,2))) AS DOUBLE)
#   davg(x)  ->  CAST(SUM(CAST(x AS DECIMAL(30,2))) AS DOUBLE) / COUNT(x)
def oracle_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,{scale}))) AS DOUBLE)"


def oracle_davg(expr: str, scale: int = 2) -> str:
    return f"{oracle_dsum(expr, scale)} / COUNT({expr})"
